"""Scene library: preset world builders (reference ``source/scenes.h``).

Scene construction is host-side numpy (it runs once); the result is a
static-shape ``World`` pytree plus the per-scene ``SolverParams`` overrides
and a ``Capacity`` plan.  Body creation order matches the reference exactly
(body index i has reference id i + 1; the reference prints newest-first).

The reference's "Rod (WIP)" and "Soft Body (WIP)" scenes declare joints and
springs only in comments (scenes.h:134-179) — the parity scenes therefore
contain bodies only, and the wired-up constraint demonstrations live in the
extension scenes ``RodJointed`` and ``SoftGrid``.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp

from ..config import Capacity, SolverParams
from ..state import (
    Bodies,
    World,
    empty_contacts,
    empty_joints,
    empty_springs,
    zero_diagnostics,
)


@dataclasses.dataclass
class Scene:
    name: str
    world: World
    params: SolverParams
    cap: Capacity
    n_real: int                  # real (non-padding) bodies, for printing


class SceneBuilder:
    """Imperative scene construction API mirroring the reference constructors
    (``new Rigid``/``new Joint``/``new Spring``/``new IgnoreCollision``)."""

    def __init__(self):
        self.size = []
        self.density = []
        self.friction = []
        self.pos = []
        self.quat = []
        self.linvel = []
        self.angvel = []
        self.joints = []        # (a, b, ra, rb, rest_quat, k_lin, k_ang)
        self.springs = []       # (a, b, ra, rb, rest, k)
        self.ignores = []       # (a, b)

    def add_body(self, size, density, friction, pos, quat=(0, 0, 0, 1),
                 linvel=(0, 0, 0), angvel=(0, 0, 0)) -> int:
        """Mirrors Rigid::Rigid (rigid.cpp:12-41); returns the body index."""
        self.size.append(size)
        self.density.append(density)
        self.friction.append(friction)
        self.pos.append(pos)
        self.quat.append(quat)
        self.linvel.append(linvel)
        self.angvel.append(angvel)
        return len(self.size) - 1

    def add_joint(self, a, b, anchor_a, anchor_b, k_lin=np.inf, k_ang=np.inf):
        """Body-body weld joint (joint.cpp:11-38).  Captures the current
        relative orientation as the rest pose."""
        qa = np.asarray(self.quat[a], np.float64)
        qb = np.asarray(self.quat[b], np.float64)
        rest = _quat_mul_np(_quat_conj_np(qa), qb)
        self.joints.append((a, b, anchor_a, anchor_b, rest, k_lin, k_ang))

    def add_world_joint(self, b, world_anchor, k_lin=np.inf, k_ang=np.inf):
        """Body-world weld joint (joint.cpp:41-60)."""
        qb = np.asarray(self.quat[b], np.float64)
        rb = _quat_rotate_np(_quat_conj_np(qb),
                             np.asarray(world_anchor) - np.asarray(self.pos[b]))
        self.joints.append((-1, b, world_anchor, rb, qb, k_lin, k_ang))

    def add_spring(self, a, b, anchor_a, anchor_b, stiffness, rest=-1.0):
        """Distance spring (spring.cpp:10-30); rest < 0 uses current length."""
        if rest < 0.0:
            pa = np.asarray(self.pos[a]) + _quat_rotate_np(
                np.asarray(self.quat[a], np.float64), np.asarray(anchor_a))
            pb = np.asarray(self.pos[b]) + _quat_rotate_np(
                np.asarray(self.quat[b], np.float64), np.asarray(anchor_b))
            rest = float(np.linalg.norm(pa - pb))
        self.springs.append((a, b, anchor_a, anchor_b, rest, stiffness))

    def ignore_collision(self, a, b):
        """Marker suppressing manifolds for the pair (ignorecollision.h)."""
        self.ignores.append((a, b))

    # ------------------------------------------------------------------
    def build(self, params: SolverParams, max_degree=None,
              min_bodies: int = 0, cache_degree: int = 0) -> tuple:
        n_real = len(self.size)
        # Pad body count to a multiple of 128 (one full TPU lane group; the
        # replicated contact cache keys bodies as (group, lane)).  Above the
        # monolithic-kernel ceiling the gridded backend blocks G in chunks
        # of 8 sublanes (a Pallas block-shape requirement), so pad to a
        # multiple of 1024 bodies there.  ``min_bodies`` forces extra
        # padding capacity (live spawning, grid-tier tests).
        n = max(128, min_bodies, -(-max(n_real, 1) // 128) * 128)
        if n > 2048:
            n = -(-n // 1024) * 1024
        pad = n - n_real

        size = np.asarray(self.size + [[0.0] * 3] * pad, np.float32).reshape(n, 3)
        density = np.asarray(self.density + [0.0] * pad, np.float32)
        friction = np.asarray(self.friction + [0.0] * pad, np.float32)
        pos = np.asarray(self.pos + [[0.0, -1e6, 0.0]] * pad, np.float32).reshape(n, 3)
        quat = np.asarray(self.quat + [[0, 0, 0, 1]] * pad, np.float32).reshape(n, 4)
        linvel = np.asarray(self.linvel + [[0.0] * 3] * pad, np.float32).reshape(n, 3)
        angvel = np.asarray(self.angvel + [[0.0] * 3] * pad, np.float32).reshape(n, 3)

        # Mass properties (rigid.cpp:23-40).
        volume = size[:, 0] * size[:, 1] * size[:, 2]
        mass = volume * density
        inv_mass = np.where(mass > 0.0, 1.0 / np.maximum(mass, 1e-30), 0.0)
        sx2, sy2, sz2 = size[:, 0] ** 2, size[:, 1] ** 2, size[:, 2] ** 2
        inertia = (mass[:, None] / 12.0) * np.stack(
            [sy2 + sz2, sx2 + sz2, sx2 + sy2], axis=-1
        )
        inv_inertia = np.where(inertia > 0.0, 1.0 / np.maximum(inertia, 1e-30), 0.0)
        inertia = np.where(mass[:, None] > 0.0, inertia, 0.0)
        radius = np.linalg.norm(size, axis=-1) * 0.5
        # Padding bodies can never pass the sphere test.
        radius[n_real:] = -1e9

        n_g = n // 128

        def cg(a):
            """(n, k) -> (k, G, 128) component-major."""
            return jnp.asarray(np.ascontiguousarray(a.T).reshape(a.shape[1], n_g, 128))

        def gg(a):
            return jnp.asarray(a.reshape(n_g, 128))

        bodies = Bodies(
            pos=cg(pos), quat=cg(quat),
            linvel=cg(linvel), angvel=cg(angvel),
            prev_linvel=cg(linvel), prev_angvel=cg(angvel),
            size=cg(size), mass=gg(mass),
            inv_mass=gg(inv_mass.astype(np.float32)),
            inertia=cg(inertia.astype(np.float32)),
            inv_inertia=cg(inv_inertia.astype(np.float32)),
            friction=gg(friction), radius=gg(radius),
        )

        # --- joints ---
        n_j = len(self.joints)
        j_deg = 0
        if n_j:
            deg = np.zeros(n, np.int32)
            for (a, b, *_rest) in self.joints:
                if a >= 0:
                    deg[a] += 1
                deg[b] += 1
            j_deg = int(deg.max())
        joints = empty_joints(n, n_j, j_deg)
        if n_j:
            ja = np.asarray([j[0] for j in self.joints], np.int32)
            jb = np.asarray([j[1] for j in self.joints], np.int32)
            joints = joints.replace(
                body_a=jnp.asarray(ja),
                body_b=jnp.asarray(jb),
                r_a=jnp.asarray([j[2] for j in self.joints], jnp.float32),
                r_b=jnp.asarray([j[3] for j in self.joints], jnp.float32),
                rest_rel_quat=jnp.asarray([j[4] for j in self.joints], jnp.float32),
                stiffness_lin=jnp.asarray([j[5] for j in self.joints], jnp.float32),
                stiffness_ang=jnp.asarray([j[6] for j in self.joints], jnp.float32),
                active=jnp.ones((n_j,), bool),
            )
            joints = joints.replace(**_replicate_joints_np(self.joints, n, j_deg))
        # Greedy-color the HARD-joint adjacency graph: hard-jointed
        # neighbors never share a color, so per-color primal sub-passes are
        # Gauss-Seidel across every stiff link (a rod chain is bipartite ->
        # 2 colors), which converges stiff chains the way the reference's
        # sequential body loop does.  Soft joints are ordinary forces and
        # stay Jacobi — measured: GS ordering destabilizes the soft-welded
        # SoftGrid sheet while being neutral-to-positive for hard chains.
        colors = np.zeros(n, np.int32)
        n_colors = 1
        hard_joints = [
            (a, b) for (a, b, _ra, _rb, _q, kl, ka) in self.joints
            if not (np.isfinite(kl) and np.isfinite(ka))
        ]
        if hard_joints:
            adj = [[] for _ in range(n)]
            for (a, b) in hard_joints:
                if a >= 0:
                    adj[a].append(b)
                    adj[b].append(a)
            for body in range(n):
                taken = {colors[o] for o in adj[body] if o < body}
                c = 0
                while c in taken:
                    c += 1
                colors[body] = c
            n_colors = int(colors.max()) + 1
            joints = joints.replace(
                color=jnp.asarray(colors.reshape(n // 128, 128))
            )

        # --- springs ---
        n_s = len(self.springs)
        s_deg = 0
        if n_s:
            deg = np.zeros(n, np.int32)
            for (a, b, *_r) in self.springs:
                if a >= 0:
                    deg[a] += 1
                deg[b] += 1
            s_deg = int(deg.max())
        springs = empty_springs(n, n_s, s_deg)
        if n_s:
            sa = np.asarray([s[0] for s in self.springs], np.int32)
            sb = np.asarray([s[1] for s in self.springs], np.int32)
            springs = springs.replace(
                body_a=jnp.asarray(sa),
                body_b=jnp.asarray(sb),
                r_a=jnp.asarray([s[2] for s in self.springs], jnp.float32),
                r_b=jnp.asarray([s[3] for s in self.springs], jnp.float32),
                rest=jnp.asarray([s[4] for s in self.springs], jnp.float32),
                stiffness=jnp.asarray([s[5] for s in self.springs], jnp.float32),
                active=jnp.ones((n_s,), bool),
            )
            springs = springs.replace(**_replicate_springs_np(self.springs, n, s_deg))

        # --- exclusions: any constrained pair never collides
        # (rigid.cpp:61-69 via broadphase check, solver.cpp:266).  Stored as
        # a per-body partner table (E, G, 128), -1 = empty. ---
        partners = [[] for _ in range(n)]
        pairs = set()
        for (a, b, *_r) in self.joints + self.springs:
            if a >= 0:
                pairs.add((min(a, b), max(a, b)))
        for (a, b) in self.ignores:
            pairs.add((min(a, b), max(a, b)))
        for (i, j) in pairs:
            partners[i].append(j)
            partners[j].append(i)
        e_deg = max((len(p) for p in partners), default=0)
        n_groups = n // 128
        excl = np.full((max(e_deg, 0), n_groups, 128), -1, np.int32)
        for body, plist in enumerate(partners):
            for e, j in enumerate(sorted(plist)):
                excl[e, body // 128, body % 128] = j

        # --- capacity plan ---
        if max_degree is None:
            max_degree = 32 if n_real > 256 else 16
        dc = cache_degree or max_degree
        cap = Capacity(
            max_degree=max_degree,
            cache_degree=cache_degree,
            joint_degree=j_deg,
            spring_degree=s_deg,
            joint_colors=n_colors,
        )

        from ..ops.broadphase import empty_bp_cache

        world = World(
            bodies=bodies,
            contacts=empty_contacts(n_groups, dc),
            joints=joints,
            springs=springs,
            exclusions=jnp.asarray(excl),
            bp=empty_bp_cache(n_groups, max_degree),
            step_index=jnp.int32(0),
            diagnostics=zero_diagnostics(),
        )
        return world, params, cap, n_real


def _replicate_joints_np(joint_list, n, degree):
    """Scatter the dense joint list into the replicated (DJ, G, 128) slot
    form (state.Joints): one slot per endpoint body per incident joint.
    Topology is static, so this runs once at build time in numpy."""
    g = n // 128
    shp = (degree, g, 128)
    other = np.full(shp, -1, np.int32)
    world = np.zeros(shp, np.int32)
    side = np.ones(shp, np.int32)
    anchor_a = np.zeros((3,) + shp, np.float32)
    anchor_b = np.zeros((3,) + shp, np.float32)
    rest = np.zeros((4,) + shp, np.float32)
    rest[3] = 1.0
    stiff_lin = np.full(shp, np.inf, np.float32)
    stiff_ang = np.full(shp, np.inf, np.float32)
    fill = np.zeros(n, np.int32)

    def put(body, partner, is_world, s, ra, rb, rq, kl, ka):
        d = fill[body]
        gi, li = body // 128, body % 128
        other[d, gi, li] = partner
        world[d, gi, li] = 1 if is_world else 0
        side[d, gi, li] = s
        anchor_a[:, d, gi, li] = ra
        anchor_b[:, d, gi, li] = rb
        rest[:, d, gi, li] = rq
        stiff_lin[d, gi, li] = kl
        stiff_ang[d, gi, li] = ka
        fill[body] += 1

    for (a, b, ra, rb, rq, kl, ka) in joint_list:
        if a >= 0:
            put(a, b, False, 1, ra, rb, rq, kl, ka)
            put(b, a, False, -1, ra, rb, rq, kl, ka)
        else:
            put(b, b, True, -1, ra, rb, rq, kl, ka)

    return {
        "other": jnp.asarray(other), "world": jnp.asarray(world),
        "side": jnp.asarray(side), "anchor_a": jnp.asarray(anchor_a),
        "anchor_b": jnp.asarray(anchor_b), "rest": jnp.asarray(rest),
        "stiff_lin": jnp.asarray(stiff_lin), "stiff_ang": jnp.asarray(stiff_ang),
    }


def _replicate_springs_np(spring_list, n, degree):
    g = n // 128
    shp = (degree, g, 128)
    other = np.full(shp, -1, np.int32)
    world = np.zeros(shp, np.int32)
    side = np.ones(shp, np.int32)
    anchor_a = np.zeros((3,) + shp, np.float32)
    anchor_b = np.zeros((3,) + shp, np.float32)
    rrest = np.zeros(shp, np.float32)
    rstiff = np.zeros(shp, np.float32)
    fill = np.zeros(n, np.int32)

    def put(body, partner, is_world, s, ra, rb, rr, k):
        d = fill[body]
        gi, li = body // 128, body % 128
        other[d, gi, li] = partner
        world[d, gi, li] = 1 if is_world else 0
        side[d, gi, li] = s
        anchor_a[:, d, gi, li] = ra
        anchor_b[:, d, gi, li] = rb
        rrest[d, gi, li] = rr
        rstiff[d, gi, li] = k
        fill[body] += 1

    for (a, b, ra, rb, rr, k) in spring_list:
        if a >= 0:
            put(a, b, False, 1, ra, rb, rr, k)
            put(b, a, False, -1, ra, rb, rr, k)
        else:
            put(b, b, True, -1, ra, rb, rr, k)

    return {
        "other": jnp.asarray(other), "world": jnp.asarray(world),
        "side": jnp.asarray(side), "anchor_a": jnp.asarray(anchor_a),
        "anchor_b": jnp.asarray(anchor_b), "rrest": jnp.asarray(rrest),
        "rstiff": jnp.asarray(rstiff),
    }


def _quat_mul_np(q1, q2):
    x1, y1, z1, w1 = q1
    x2, y2, z2, w2 = q2
    return np.asarray([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ])


def _quat_conj_np(q):
    return np.asarray([-q[0], -q[1], -q[2], q[3]])


def _quat_rotate_np(q, v):
    qv = q[:3]
    t = 2.0 * np.cross(qv, v)
    return v + q[3] * t + np.cross(qv, t)


def _axis_angle_np(axis, angle):
    axis = np.asarray(axis, np.float64)
    half = angle * 0.5
    s = math.sin(half)
    return np.asarray([axis[0] * s, axis[1] * s, axis[2] * s, math.cos(half)])


# ---------------------------------------------------------------------------
# Scene definitions (scenes.h:23-179)
# ---------------------------------------------------------------------------

def _ground(sb: SceneBuilder):
    """100 x 1 x 100 static slab at y = -0.5 (scenes.h:27-31)."""
    sb.add_body((100, 1, 100), 0.0, 0.5, (0, -0.5, 0))


def scene_empty():
    sb = SceneBuilder()
    return sb.build(SolverParams())


def scene_ground():
    sb = SceneBuilder()
    _ground(sb)
    return sb.build(SolverParams())


def scene_stack():
    """10-cube vertical stack (scenes.h:33-40)."""
    sb = SceneBuilder()
    _ground(sb)
    for i in range(10):
        sb.add_body((1, 1, 1), 1.0, 0.5, (0, i * 1.1 + 0.5, 0))
    return sb.build(SolverParams())


def scene_pyramid():
    """10-level 2D pyramid (scenes.h:42-53)."""
    sb = SceneBuilder()
    _ground(sb)
    size = 10
    for y in range(size):
        for x in range(size - y):
            x_pos = (x - (size - y - 1) * 0.5) * 1.1
            y_pos = y * 1.05 + 0.5
            sb.add_body((1, 1, 1), 1.0, 0.5, (x_pos, y_pos, 0))
    return sb.build(SolverParams())


def scene_wall():
    """8 x 8 running-bond brick wall (scenes.h:55-72)."""
    sb = SceneBuilder()
    _ground(sb)
    w, h = 8, 8
    brick = (1.0, 0.5, 0.5)
    spacing_x, spacing_y = 1.03, 0.52
    base_y = brick[1] * 0.5
    for i in range(h):
        for j in range(w):
            x_off = 0.0 if i % 2 == 0 else 0.5 * spacing_x
            x = (j - (w - 1) * 0.5) * spacing_x + x_off
            y = i * spacing_y + base_y
            sb.add_body(brick, 1.0, 0.4, (x, y, -5))
    return sb.build(SolverParams())


def scene_two_block_drop():
    """Tip-land-settle regression scene (scenes.h:74-85)."""
    sb = SceneBuilder()
    _ground(sb)
    sb.add_body((1, 1, 1), 1.0, 0.5, (0, 0.5, 0))
    tilt = _axis_angle_np((0, 0, 1), 0.45)
    sb.add_body((1, 1, 1), 1.0, 0.5, (0.18, 2.2, 0), tilt, (0, 0, 0), (0, 0, 1))
    return sb.build(SolverParams())


def _hash01(x: int) -> float:
    """Exact uint32 xorshift-multiply hash of scenes.h:108-115."""
    x &= 0xFFFFFFFF
    x ^= x >> 16
    x = (x * 0x7FEB352D) & 0xFFFFFFFF
    x ^= x >> 15
    x = (x * 0x846CA68B) & 0xFFFFFFFF
    x ^= x >> 16
    return (x & 0x00FFFFFF) / 16777215.0


def scene_stress1000():
    """10x10x10 = 1000 falling cubes with deterministic jitter
    (scenes.h:87-132) and the documented stress tuning."""
    sb = SceneBuilder()
    _ground(sb)
    nx = ny = nz = 10
    spacing_xz, spacing_y = 1.15, 2.0
    start_y, jitter_xz, jitter_y = 20.0, 0.04, 0.25
    for y in range(ny):
        for z in range(nz):
            for x in range(nx):
                seed = (x + nx * (z + nz * y) + 1) & 0xFFFFFFFF
                jx = (_hash01((seed * 9781) & 0xFFFFFFFF) * 2.0 - 1.0) * jitter_xz
                jz = (_hash01((seed * 6271) & 0xFFFFFFFF) * 2.0 - 1.0) * jitter_xz
                jy = _hash01((seed * 3343) & 0xFFFFFFFF) * jitter_y
                px = (x - (nx - 1) * 0.5) * spacing_xz + jx
                py = start_y + y * spacing_y + jy
                pz = (z - (nz - 1) * 0.5) * spacing_xz + jz
                sb.add_body((1, 1, 1), 1.0, 0.5, (px, py, pz))
    # lhs_fresh_rebuild_every=4: the landing cascade reuses the stale
    # Hessian on the same 4-iteration AL blocks as the calm regime.
    # Measured (round 4, full 700-step envelope): maxPen 0.0000, ejected
    # bodies 0 (the C++ reference loses 15 on this scene), overflow 0,
    # settled manifold count unchanged — and the falling window runs 17%
    # faster (2270 -> 2659 steps/s).  Safe here because the penalty ramp
    # only fires on rebuild block tails (the round-2 catapult came from
    # ramping against a stale Hessian, since fixed by the AL cadence).
    params = SolverParams(iterations=20, beta=30000.0, gamma=0.995,
                          lhs_fresh_rebuild_every=4)
    # D=24 candidate slots: the settled pile's max broadphase degree is 20
    # (measured over 700 steps), so 24 leaves headroom with zero overflow.
    # cache_degree=12: the realized NEAR degree (candidates within the
    # collision margin on the 6 face axes — the precull_near width) never
    # exceeds 10 and the manifold degree never exceeds 9 over the same
    # run, so the narrowphase/solve/warmstart/cache arrays run at half the
    # candidate width (overflow counted in diagnostics if a transient ever
    # exceeds 12).
    return sb.build(params, max_degree=24, cache_degree=12)


def _scene_stress_n(nx, ny, nz, max_degree=24, cache_degree=12,
                    order="yzx"):
    """Capacity-scaling stress scenes beyond the reference's 10x10x10 (same
    hash-jitter construction, scenes.h:87-132 semantics at larger counts).

    ``order``: body-index assignment order.  "yzx" = the reference's loop
    nest (y outer).  "xzy" assigns indices x-major, so the grid backend's
    body blocks become contiguous x-slabs of the spawn grid: bodies keep
    their xz-neighborhood through landing, which turns most contact pairs
    into INTRA-block pairs — the gridded tier's cross-block pose lag then
    applies only to slab-boundary contacts.  The jitter seed stays a pure
    function of the grid cell (identical body placements; only the index
    labeling changes)."""
    sb = SceneBuilder()
    _ground(sb)
    spacing_xz, spacing_y = 1.15, 2.0
    start_y, jitter_xz, jitter_y = 20.0, 0.04, 0.25
    cells = [(x, y, z) for y in range(ny) for z in range(nz)
             for x in range(nx)]
    if order == "xzy":
        cells.sort(key=lambda c: (c[0], c[2], c[1]))
    for x, y, z in cells:
        seed = (x + nx * (z + nz * y) + 1) & 0xFFFFFFFF
        jx = (_hash01((seed * 9781) & 0xFFFFFFFF) * 2.0 - 1.0) * jitter_xz
        jz = (_hash01((seed * 6271) & 0xFFFFFFFF) * 2.0 - 1.0) * jitter_xz
        jy = _hash01((seed * 3343) & 0xFFFFFFFF) * jitter_y
        px = (x - (nx - 1) * 0.5) * spacing_xz + jx
        py = start_y + y * spacing_y + jy
        pz = (z - (nz - 1) * 0.5) * spacing_xz + jz
        sb.add_body((1, 1, 1), 1.0, 0.5, (px, py, pz))
    # Same impact-cadence tuning as Stress1000 (see scene_stress1000).
    params = SolverParams(iterations=20, beta=30000.0, gamma=0.995,
                          lhs_fresh_rebuild_every=4)
    return sb.build(params, max_degree=max_degree, cache_degree=cache_degree)


def scene_stress2048():
    """13x12x13 = 2028 cubes: 2x the reference's stress scene, on the
    Pallas fast path (measured 732 steps/sec settled, maxPen 0,
    overflow 0)."""
    return _scene_stress_n(13, 12, 13)


def scene_stress4096():
    """16x16x16 = 4096 cubes.  Above the fused Pallas kernel's VMEM
    ceiling (the monolithic step kernel at G=40/D=28 schedules 250 MB of
    VMEM vs the 128 MB chip — tools/try_fused_large.py), so on TPU this
    runs the gridded Pallas tier (solver_tpu.step_grid).

    Round-5 validated tuning (tools/stress_envelope_probe.py, 1000-step
    runs on TPU v5e):

    - max_degree=28 / cache_degree=16: the realized broadphase degree
      peaks at 24 and the near degree at 12 over the full fall+settle run;
      the round-4 inherited plan (24/12) overflowed the near cache 355
      times and left standing penetration.  With 28/16: overflow 0.
    - order="xzy": body indices x-major, so the grid tier's body blocks
      are contiguous x-slabs — contact pairs stay mostly intra-block and
      the tier's bounded cross-block pose lag applies only at slab
      boundaries.  Settled envelope with the reference loop order: maxPen
      0.010-0.013 standing (2x slop); with x-major: 0.00000 per-step once
      the pile locks (steps 900+), matching the C++ oracle's settled
      envelope at this N (ref_stressn: maxPen 0.0000 from step 250)."""
    return _scene_stress_n(16, 16, 16, max_degree=28, cache_degree=16,
                           order="xzy")


def scene_rod():
    """Reference parity: 15 segments, joints only declared in comments
    (scenes.h:138-151) — bodies fall freely except the static anchor."""
    sb = SceneBuilder()
    for i in range(15):
        sb.add_body((0.25, 1, 0.25), 0.0 if i == 0 else 1.0, 0.5, (0, 10.0 - i, 0))
    return sb.build(SolverParams())


def scene_soft_body():
    """Reference parity: 10x10 grid of cubes, constraints commented out
    (scenes.h:153-179)."""
    sb = SceneBuilder()
    _ground(sb)
    w = h = 10
    for i in range(w):
        for j in range(h):
            sb.add_body((0.5, 0.5, 0.5), 1.0, 0.3,
                        (i * 0.6 - w * 0.3, j * 0.6 + 2.0, 0))
    return sb.build(SolverParams())


# --- extension scenes: the constraint system actually wired up -------------

def scene_rod_jointed():
    """The rod the reference intended: 15 segments welded end to end,
    top segment static.

    iterations=20: a 15-link chain under a Jacobi primal needs ~2x the
    default sweep count to converge each step; at 20 the chain comes fully
    to rest and the joint dual tracker's lambda matches the analytic chain
    tension within 0.6% on every link (tools/joint_dual_study.py).  At the
    default 10 the chain keeps a standing micro-stretch oscillation and
    lambda tracks the inflated dynamic holding force instead."""
    sb = SceneBuilder()
    prev = None
    for i in range(15):
        curr = sb.add_body((0.25, 1, 0.25), 0.0 if i == 0 else 1.0, 0.5,
                           (0, 10.0 - i, 0))
        if prev is not None:
            sb.add_joint(prev, curr, (0, -0.5, 0), (0, 0.5, 0))
        prev = curr
    return sb.build(SolverParams(iterations=20))


def scene_soft_grid():
    """The soft-body grid the reference intended: cubes welded softly to
    neighbors, diagonal collisions ignored.  Starts just above the ground
    (the reference's 2 m drop would slam 100 cubes' momentum through the
    bottom row)."""
    sb = SceneBuilder()
    _ground(sb)
    w = h = 10
    grid = [[0] * h for _ in range(w)]
    for i in range(w):
        for j in range(h):
            # Density 2 keeps the contact force caps (5000 * massScale,
            # manifold.cpp:199-204) above the worst-case joint tension so a
            # folding sheet cannot punch through the ground.
            grid[i][j] = sb.add_body((0.5, 0.5, 0.5), 2.0, 0.3,
                                     (i * 0.6 - w * 0.3, j * 0.6 + 0.3, 0))
    stiff = 500.0
    for i in range(w):
        for j in range(h):
            if i > 0:
                sb.add_joint(grid[i - 1][j], grid[i][j], (0.3, 0, 0), (-0.3, 0, 0),
                             k_lin=stiff, k_ang=stiff)
            if j > 0:
                sb.add_joint(grid[i][j - 1], grid[i][j], (0, 0.3, 0), (0, -0.3, 0),
                             k_lin=stiff, k_ang=stiff)
            if i > 0 and j > 0:
                sb.ignore_collision(grid[i - 1][j - 1], grid[i][j])
                sb.ignore_collision(grid[i - 1][j], grid[i][j - 1])
    return sb.build(SolverParams())


SCENES = {
    "Empty": scene_empty,
    "Ground": scene_ground,
    "Stack": scene_stack,
    "Pyramid": scene_pyramid,
    "Wall": scene_wall,
    "TwoBlockDrop": scene_two_block_drop,
    "Stress1000": scene_stress1000,
    "Rod (WIP)": scene_rod,
    "Soft Body (WIP)": scene_soft_body,
    # extensions beyond the reference scene list
    "RodJointed": scene_rod_jointed,
    "SoftGrid": scene_soft_grid,
    "Stress2048": scene_stress2048,
    "Stress4096": scene_stress4096,
}

SCENE_NAMES = list(SCENES.keys())


def load_scene(name: str) -> Scene:
    if name not in SCENES:
        raise KeyError(f"unknown scene {name!r}; available: {SCENE_NAMES}")
    world, params, cap, n_real = SCENES[name]()
    return Scene(name=name, world=world, params=params, cap=cap, n_real=n_real)
