"""SoA world state pytrees (L1 + constraint buffers of the engine).

TPU-native replacement for the reference's intrusive linked lists of
``Rigid``/``Force`` objects (``solver.h:48-109``, ``force.cpp:12-69``):

- ``Bodies``    — structure-of-arrays body state, static bodies are rows with
                  ``inv_mass == 0`` (rigid.cpp:24-25).
- ``Contacts``  — fixed-capacity persistent contact cache keyed by the sorted
                  body-pair key ``i * N + j``; replaces the per-step
                  ``new Manifold`` / ``delete`` lifecycle (solver.cpp:261-296)
                  and carries warmstart data (lambda/penalty/anchors/stick)
                  across steps (manifold.cpp:71-175).
- ``Joints``    — SoA 6-row weld joints (joint.h:14-48).
- ``Springs``   — SoA 1-row distance springs (spring.h:13-38).
- ``World``     — the full simulation state: one pytree, one ``step``.

Everything is float32 / int32 with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .maths import quat_identity

# Sentinel for an empty pair slot (sorts after every valid key).
INACTIVE_KEY = np.int32(2**31 - 1)


def _pytree(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree
@dataclasses.dataclass(frozen=True)
class Bodies:
    """Per-body state in component-major (G, 128) lane groups.

    Body n lives at group n // 128, lane n % 128; body i has reference id
    i + 1.  Vector quantities are stored component-leading — pos[k] is the
    (G, 128) array of the k-th coordinate — so state leaves feed the Pallas
    kernels directly with zero repacking, and every XLA op runs on
    full-lane tiles.  Use ``pos_n3``/``quat_n4``-style accessors for
    row-vector views.
    """

    # Dynamic state
    pos: Any            # (3, G, 128)
    quat: Any           # (4, G, 128) (x, y, z, w)
    linvel: Any         # (3, G, 128)
    angvel: Any         # (3, G, 128)
    prev_linvel: Any    # (3, G, 128) — feeds the adaptive gravity weight
    prev_angvel: Any    # (3, G, 128)
    # Constant per-body parameters (kept in the pytree so a single World
    # fully describes the simulation)
    size: Any           # (3, G, 128) box extents
    mass: Any           # (G, 128)
    inv_mass: Any       # (G, 128)  0 => static body
    inertia: Any        # (3, G, 128) body-local diagonal box inertia
    inv_inertia: Any    # (3, G, 128)
    friction: Any       # (G, 128)
    radius: Any         # (G, 128) bounding-sphere radius = |size| / 2

    @property
    def n(self) -> int:
        return self.mass.shape[0] * 128

    @property
    def g(self) -> int:
        return self.mass.shape[0]

    @property
    def dynamic(self):
        return self.inv_mass > 0.0

    def _n3(self, leaf):
        return jnp.moveaxis(leaf.reshape(leaf.shape[0], -1), 0, 1)

    @property
    def pos_n3(self):
        return self._n3(self.pos)

    @property
    def quat_n4(self):
        return self._n3(self.quat)

    @property
    def linvel_n3(self):
        return self._n3(self.linvel)

    @property
    def angvel_n3(self):
        return self._n3(self.angvel)

    def replace(self, **kw) -> "Bodies":
        return dataclasses.replace(self, **kw)


@_pytree
@dataclasses.dataclass(frozen=True)
class Contacts:
    """Persistent contact cache in replicated body-major neighbor-slot form.

    Bodies are laid out as (G, 128) groups (body n = group n//128, lane
    n%128, N padded to G*128).  Each body owns D neighbor slots; slot
    (d, g, lane) holds that body's view of the manifold with body
    ``other[d, g, lane]`` (-1 = empty).  Every active pair therefore appears
    TWICE — once per endpoint.  All slot data is stored in the *canonical*
    pair frame (A = lower body index, B = higher), and both replicas compute
    bit-identical updates (same operands, same instruction stream), so no
    cross-replica synchronization is ever needed.  This removes all
    gather/scatter/sort from the solver loop: a body's constraint rows are a
    contiguous reduction over its own D slots.

    Why not a compacted pair list?  On TPU, scalar gathers are the enemy;
    this layout costs 2x memory/compute on row math (cheap, elementwise)
    and buys gather-free aggregation (the expensive part).

    Contact-manifold semantics mirror the reference exactly: up to 4
    contacts x 3 rows (normal, tangent1, tangent2), deterministic feature
    ids, per-pair normal (manifold.cpp, collision.cpp).
    """

    other: Any          # (D, G, 128) int32 neighbor body index or -1
    count: Any          # (D, G, 128) int32 contacts in manifold (0..4)
    feature: Any        # (4, D, G, 128) int32 feature ids
    r_a: Any            # (4, 3, D, G, 128) local anchor on canonical body A
    r_b: Any            # (4, 3, D, G, 128) local anchor on canonical body B
    normal: Any         # (3, D, G, 128) world contact normal, B -> A (unit)
    stick: Any          # (4, D, G, 128) bool static-friction latch
    c0_n: Any           # (4, D, G, 128) alpha-stabilization normal cache
    c0_t1: Any          # (4, D, G, 128) tangential slip cache 1
    c0_t2: Any          # (4, D, G, 128) tangential slip cache 2
    lam: Any            # (12, D, G, 128) dual variables (3 rows per contact)
    penalty: Any        # (12, D, G, 128) penalty stiffness per row

    @property
    def d(self) -> int:
        return self.other.shape[0]

    @property
    def g(self) -> int:
        return self.other.shape[1]

    def replace(self, **kw) -> "Contacts":
        return dataclasses.replace(self, **kw)


def empty_contacts(n_groups: int, degree: int) -> Contacts:
    d, g = degree, n_groups
    return Contacts(
        other=jnp.full((d, g, 128), -1, jnp.int32),
        count=jnp.zeros((d, g, 128), jnp.int32),
        feature=jnp.full((4, d, g, 128), -1, jnp.int32),
        r_a=jnp.zeros((4, 3, d, g, 128), jnp.float32),
        r_b=jnp.zeros((4, 3, d, g, 128), jnp.float32),
        normal=jnp.zeros((3, d, g, 128), jnp.float32),
        stick=jnp.zeros((4, d, g, 128), bool),
        c0_n=jnp.zeros((4, d, g, 128), jnp.float32),
        c0_t1=jnp.zeros((4, d, g, 128), jnp.float32),
        c0_t2=jnp.zeros((4, d, g, 128), jnp.float32),
        lam=jnp.zeros((12, d, g, 128), jnp.float32),
        penalty=jnp.zeros((12, d, g, 128), jnp.float32),
    )


@_pytree
@dataclasses.dataclass(frozen=True)
class Joints:
    """6-row weld joints: 3 anchor-coincidence + 3 relative-rotation rows.

    ``body_a == -1`` encodes a body-to-world joint (joint.cpp:41-60).
    ``stiffness_lin``/``stiffness_ang`` use +inf for hard rows (FLT_MAX in
    the reference).

    Storage is two-level, like contacts: a dense per-joint table (the
    build/tooling view) plus the REPLICATED body-major slot form both
    backends compute in — each endpoint body owns one (DJ, G, 128) slot per
    incident joint, all slot math is expressed in the joint's own A/B frame
    (``side``), and both replicas produce bit-identical lam/penalty updates
    with zero communication (same scheme as state.Contacts).  Joint
    topology is static per scene, so everything but lam/penalty is
    replicated once at build time.
    """

    # --- dense per-joint view (build/tooling) ---
    body_a: Any         # (J,) int32, -1 = world
    body_b: Any         # (J,) int32
    r_a: Any            # (J, 3) local anchor on A (world anchor if body_a=-1)
    r_b: Any            # (J, 3) local anchor on B
    rest_rel_quat: Any  # (J, 4) initial conj(qA) * qB
    stiffness_lin: Any  # (J,)
    stiffness_ang: Any  # (J,)
    motor: Any          # (J, 6) per-row motor force, added to the primal
                        # force (solver.cpp:380); never nonzero upstream
    active: Any         # (J,) bool
    # --- replicated body-major slot form (the compute layout) ---
    other: Any          # (DJ, G, 128) int32 partner body (-1 empty; own
                        # index for body-world joints)
    world: Any          # (DJ, G, 128) int32, 1 = the A side is the world
    side: Any           # (DJ, G, 128) int32 +1 own body is A, -1 own is B
    anchor_a: Any       # (3, DJ, G, 128) A-side local anchor (world point
                        # when world=1)
    anchor_b: Any       # (3, DJ, G, 128)
    rest: Any           # (4, DJ, G, 128) rest relative quat
    stiff_lin: Any      # (DJ, G, 128)
    stiff_ang: Any      # (DJ, G, 128)
    rmotor: Any         # (6, DJ, G, 128)
    lam: Any            # (6, DJ, G, 128) dual state (replica-identical)
    penalty: Any        # (6, DJ, G, 128)
    # (G, 128) int32 body color from greedy-coloring the hard-joint
    # adjacency graph.  The primal pass solves colors sequentially
    # (Gauss-Seidel across stiff links, the reference's convergence
    # structure, solver.cpp:344-409) while contacts stay Jacobi.
    color: Any

    @property
    def j(self) -> int:
        return self.body_b.shape[0]

    @property
    def dj(self) -> int:
        return self.other.shape[0]

    def replace(self, **kw) -> "Joints":
        return dataclasses.replace(self, **kw)


def empty_joints(n_bodies: int, max_joints: int = 0, degree: int = 0) -> Joints:
    j = max_joints
    dj = degree
    g = n_bodies // 128
    return Joints(
        body_a=jnp.full((j,), -1, jnp.int32),
        body_b=jnp.zeros((j,), jnp.int32),
        r_a=jnp.zeros((j, 3), jnp.float32),
        r_b=jnp.zeros((j, 3), jnp.float32),
        rest_rel_quat=quat_identity((j,)),
        stiffness_lin=jnp.full((j,), jnp.inf, jnp.float32),
        stiffness_ang=jnp.full((j,), jnp.inf, jnp.float32),
        motor=jnp.zeros((j, 6), jnp.float32),
        active=jnp.zeros((j,), bool),
        other=jnp.full((dj, g, 128), -1, jnp.int32),
        world=jnp.zeros((dj, g, 128), jnp.int32),
        side=jnp.ones((dj, g, 128), jnp.int32),
        anchor_a=jnp.zeros((3, dj, g, 128), jnp.float32),
        anchor_b=jnp.zeros((3, dj, g, 128), jnp.float32),
        rest=jnp.zeros((4, dj, g, 128), jnp.float32).at[3].set(1.0),
        stiff_lin=jnp.full((dj, g, 128), jnp.inf, jnp.float32),
        stiff_ang=jnp.full((dj, g, 128), jnp.inf, jnp.float32),
        rmotor=jnp.zeros((6, dj, g, 128), jnp.float32),
        lam=jnp.zeros((6, dj, g, 128), jnp.float32),
        penalty=jnp.full((6, dj, g, 128), 2.0e4, jnp.float32),
        color=jnp.zeros((g, 128), jnp.int32),
    )


@_pytree
@dataclasses.dataclass(frozen=True)
class Springs:
    """1-row distance constraints C = |pA - pB| - rest (spring.cpp:33-56).

    Same two-level storage as Joints: dense build view + replicated
    (DS, G, 128) body-major slots.  Springs are always soft, so the only
    dynamic state is the per-row penalty (lambda is excluded from soft
    rows' primal force and never dual-updated — solver.cpp:290-292, 379,
    416-417)."""

    # --- dense per-spring view ---
    body_a: Any         # (S,) int32, -1 = world anchor
    body_b: Any         # (S,) int32
    r_a: Any            # (S, 3)
    r_b: Any            # (S, 3)
    rest: Any           # (S,)
    stiffness: Any      # (S,)
    active: Any         # (S,) bool
    # --- replicated slot form ---
    other: Any          # (DS, G, 128) int32 partner (-1 empty, own for world)
    world: Any          # (DS, G, 128) int32, 1 = A side is a world anchor
    side: Any           # (DS, G, 128) int32
    anchor_a: Any       # (3, DS, G, 128)
    anchor_b: Any       # (3, DS, G, 128)
    rrest: Any          # (DS, G, 128)
    rstiff: Any         # (DS, G, 128)
    penalty: Any        # (DS, G, 128)

    @property
    def s(self) -> int:
        return self.body_b.shape[0]

    @property
    def ds(self) -> int:
        return self.other.shape[0]

    def replace(self, **kw) -> "Springs":
        return dataclasses.replace(self, **kw)


def empty_springs(n_bodies: int, max_springs: int = 0, degree: int = 0) -> Springs:
    s = max_springs
    ds = degree
    g = n_bodies // 128
    return Springs(
        body_a=jnp.full((s,), -1, jnp.int32),
        body_b=jnp.zeros((s,), jnp.int32),
        r_a=jnp.zeros((s, 3), jnp.float32),
        r_b=jnp.zeros((s, 3), jnp.float32),
        rest=jnp.zeros((s,), jnp.float32),
        stiffness=jnp.zeros((s,), jnp.float32),
        active=jnp.zeros((s,), bool),
        other=jnp.full((ds, g, 128), -1, jnp.int32),
        world=jnp.zeros((ds, g, 128), jnp.int32),
        side=jnp.ones((ds, g, 128), jnp.int32),
        anchor_a=jnp.zeros((3, ds, g, 128), jnp.float32),
        anchor_b=jnp.zeros((3, ds, g, 128), jnp.float32),
        rrest=jnp.zeros((ds, g, 128), jnp.float32),
        rstiff=jnp.zeros((ds, g, 128), jnp.float32),
        penalty=jnp.full((ds, g, 128), 2.0e4, jnp.float32),
    )


@_pytree
@dataclasses.dataclass(frozen=True)
class Diagnostics:
    """Per-step stats mirroring Solver::Diagnostics (solver.h:155-164),
    plus TPU-rebuild safety counters and step-control scalars.

    Stored as ONE 16-lane f32 vector rather than 16 separate scalars: the
    step is scanned on-device, and a pytree of separate scalars costs one
    tiny extraction op per field per step on a backend where every XLA op
    in the step graph has real launch overhead.  Field access goes through
    properties; ``jax.device_get`` returns the same dataclass with a numpy
    ``vec``, so host consumers are unchanged.

    Lanes 11-15 are the step-control block, computed by the backend kernels
    on END-of-step state so the NEXT step's control flow (Hessian-staleness
    cadence, ballistic fast path, broadphase-cache refresh) is pure scalar
    logic with no extra reductions or probe launches:

      11  gate_speed_sq: max |v|^2 over dynamic bodies above fall_freeze_y
      12  near_speed_sq: same max over bodies NEAR a candidate slot (AABB
          gap minus one step of worst-case mutual travel within the
          collision margin) — scopes the stale gate to bodies whose 6x6
          Hessian can actually gain contact rows next step
      13  min_cand_gap: min AABB surface gap over valid candidate slots
          (1e9 when none).  The AABB gap lower-bounds box distance, so
          min_cand_gap > collision_margin proves narrowphase at these
          poses yields zero contacts (the ballistic predicate)
      14  bp_dev_mm: max compensated surface motion vs the broadphase
          anchor (see ops/broadphase.BroadphaseCache reuse bound 1)
      15  bp_dev_raw: max raw surface motion vs the anchor (bound 2)
    """

    vec: Any   # (16,) f32

    # --- reference diagnostics block (solver.h:155-164) ---
    @property
    def max_penetration(self):
        return self.vec[0]

    @property
    def max_constraint_violation(self):
        return self.vec[1]

    @property
    def max_linear_speed(self):
        return self.vec[2]

    @property
    def max_angular_speed(self):
        return self.vec[3]

    @property
    def max_normal_impulse(self):
        return self.vec[4]

    @property
    def active_contacts(self):
        return self.vec[5].astype(jnp.int32)

    @property
    def active_manifolds(self):
        return self.vec[6].astype(jnp.int32)

    @property
    def dynamic_bodies(self):
        return self.vec[7].astype(jnp.int32)

    # --- safety counters ---
    @property
    def sanitized(self):
        return self.vec[8].astype(jnp.int32)

    @property
    def pair_overflow(self):
        return self.vec[9].astype(jnp.int32)

    @property
    def degree_overflow(self):
        return self.vec[10].astype(jnp.int32)

    # --- step-control block ---
    @property
    def gate_speed_sq(self):
        return self.vec[11]

    @property
    def near_speed_sq(self):
        return self.vec[12]

    @property
    def min_cand_gap(self):
        return self.vec[13]

    @property
    def bp_dev_mm(self):
        return self.vec[14]

    @property
    def bp_dev_raw(self):
        return self.vec[15]

    def replace(self, **kw) -> "Diagnostics":
        return dataclasses.replace(self, **kw)


# Sentinel control block for a world with no step history: speed gates
# pessimistic (fresh Hessians), ballistic off (min gap 0), broadphase
# refresh forced (dev 1e9).
CONTROL_RESET = (1.0e9, 1.0e9, 0.0, 1.0e9, 1.0e9)


def make_diagnostics(max_penetration=0.0, max_constraint_violation=0.0,
                     max_linear_speed=0.0, max_angular_speed=0.0,
                     max_normal_impulse=0.0, active_contacts=0,
                     active_manifolds=0, dynamic_bodies=0, sanitized=0,
                     pair_overflow=0, degree_overflow=0,
                     control=CONTROL_RESET) -> Diagnostics:
    vals = [max_penetration, max_constraint_violation, max_linear_speed,
            max_angular_speed, max_normal_impulse, active_contacts,
            active_manifolds, dynamic_bodies, sanitized, pair_overflow,
            degree_overflow] + list(control)
    vals = [jnp.asarray(v, jnp.float32) for v in vals]
    return Diagnostics(vec=jnp.stack(vals))


def zero_diagnostics() -> Diagnostics:
    return make_diagnostics()


def reset_control(diag: Diagnostics) -> Diagnostics:
    """Invalidate the step-control block (lanes 11-15) after any
    out-of-band world mutation (live spawn, manual state edit): forces a
    broadphase refresh and fresh-Hessian cadence on the next step."""
    vec = jnp.concatenate(
        [diag.vec[:11], jnp.asarray(CONTROL_RESET, jnp.float32)]
    )
    return Diagnostics(vec=vec)


@_pytree
@dataclasses.dataclass(frozen=True)
class World:
    """The whole simulation state: one pytree, advanced by one pure step."""

    bodies: Bodies
    contacts: Contacts
    joints: Joints
    springs: Springs
    # (E, G, 128) int32: per-body list of partner indices whose collisions
    # are suppressed (-1 = empty) — the TPU equivalent of isConstrainedTo()
    # returning true for jointed/spring-linked/ignored pairs
    # (rigid.cpp:61-69, ignorecollision.h:14-23).
    exclusions: Any
    # Margin-enlarged candidate lists + refresh anchor (BroadphaseCache).
    bp: Any
    step_index: Any          # int32
    diagnostics: Diagnostics

    def replace(self, **kw) -> "World":
        return dataclasses.replace(self, **kw)
