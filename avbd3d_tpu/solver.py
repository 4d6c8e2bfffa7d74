"""The AVBD step: one pure, jit-compiled function over the whole world.

TPU-native rebuild of ``Solver::step`` (solver.cpp:255-514).  The reference's
six phases map as:

  1. Broadphase              -> masked all-pairs sphere test + per-body
                                neighbor slots (ops/broadphase.py)
  2. Init/warmstart forces   -> replicated narrowphase + body-local
                                cross-step matching (ops/replicated.py)
  3. Predict body states     -> vectorized inertial prediction
  4. Iterative solve         -> lax.fori_loop of (Jacobi primal block solve +
                                dual ascent).  The C++ primal is Gauss-Seidel
                                over the body list (solver.cpp:344-409); here
                                every body solves against the same pose
                                snapshot each iteration (block Jacobi, closer
                                to textbook VBD), with optional
                                under-relaxation (params.relaxation).
  5. Velocity update         -> vectorized finite-difference + damping
  6. Diagnostics             -> on-device reductions, returned as a pytree

All contact state lives in the replicated body-major cache (state.Contacts):
constraint aggregation is a plain reduction over each body's D neighbor
slots; the only cross-body communication is the neighbor-pose fetch.  This
module is the portable XLA backend (native gathers — fast on CPU); the
Pallas TPU backend (solver_tpu.py) runs the same replicated core inside
mega-kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from . import cm
from .config import Capacity, SolverParams
from .maths import (
    quat_conj,
    quat_mul,
    quat_normalize,
    quat_vec_doubled,
    solve66,
)
from .ops import replicated as rep
from .ops.broadphase import control_lanes, refresh_scalar, symmetric_filter
from .ops.joints import (
    joint_accumulate,
    joint_decay,
    joint_dual,
    joint_force,
    joint_dual_ema,
    joint_geometry,
)
from .ops.springs import (
    spring_accumulate,
    spring_decay,
    spring_force,
    spring_geometry,
)
from .state import Diagnostics, World


def _sanitize(x, default, count):
    """NaN/Inf reset-with-counter: the in-jit version of sanitizeVec3/Quat
    (solver.cpp:41-66).  Counts affected rows instead of printf-ing."""
    finite = jnp.all(jnp.isfinite(x), axis=-1)
    fixed = jnp.where(finite[..., None], x, default)
    return fixed, count + jnp.sum((~finite).astype(jnp.int32))


def stale_lhs_ok(b, bp, params, refine: bool = True, comm=None,
                 gather=None) -> "jnp.ndarray":
    """True when the stale-Hessian cadence (config.lhs_rebuild_every) is
    safe this step, evaluated by reduction on the CURRENT state.

    Only the grid tier still calls this (refine=False): the fused-kernel
    and portable paths read the equivalent scalars from the previous
    step's control block instead (state.Diagnostics lanes 11/12, computed
    by ops/broadphase.control_lanes on end-of-step state — the same
    predicate one launch earlier, for free)."""
    if comm is None:
        from .comm import LOCAL_COMM as comm
    gather = gather or rep.xla_gather
    v2 = b.linvel[0] ** 2 + b.linvel[1] ** 2 + b.linvel[2] ** 2
    v2 = jnp.where(b.dynamic, v2, 0.0)
    thresh = params.lhs_stale_speed_max**2
    ok_global = comm.pmax(jnp.max(v2)) <= thresh
    if not refine:
        return ok_global

    def refined(_):
        from .ops.broadphase import bp_probe

        if comm.n_shards == 1 and jax.default_backend() == "tpu":
            from . import solver_tpu

            _mg, _ns, near = solver_tpu.bp_probe_tpu(bp.nb, b, params)
        else:
            g_len = float(sum(x * x for x in params.gravity) ** 0.5)
            _mg, _ns, near = bp_probe(
                bp.nb, tuple(b.pos[k] for k in range(3)),
                tuple(b.quat[k] for k in range(4)),
                tuple(b.size[k] * 0.5 for k in range(3)), b.radius,
                tuple(b.linvel[k] for k in range(3)),
                tuple(b.angvel[k] for k in range(3)),
                params.dt, params.collision_margin, g_len, gather,
            )
        return comm.pmax(jnp.max(jnp.where(near, v2, 0.0))) <= thresh

    return lax.cond(ok_global, lambda _: jnp.bool_(True), refined, operand=None)


def control_gates(diag_vec, refreshed, params):
    """Step-control predicates from the carried control block (scalar
    logic only — see state.Diagnostics lanes 11-15).

    Returns (stale_ok, calm).  The refined near-speed lane (12) was
    computed against the PREVIOUS candidate lists, so it is trusted only
    when this step reused them (``~refreshed``); on refresh steps the gate
    falls back to the conservative global bound — exactly the steps where
    bodies moved enough that freshness is warranted anyway."""
    th2 = jnp.float32(params.lhs_stale_speed_max**2)
    stale_ok = (diag_vec[11] <= th2) | (
        jnp.logical_not(refreshed) & (diag_vec[12] <= th2)
    )
    calm_th = min(params.impact_speed_min, params.lhs_stale_speed_max)
    calm = diag_vec[11] <= jnp.float32(calm_th**2)
    return stale_ok, calm


def attach_control(world: World, params: SolverParams, gather=rep.xla_gather,
                   comm=None) -> World:
    """Compute the control block on ``world``'s (end-of-step) state and
    write it into diagnostics lanes 11-15.  Used by the portable XLA path
    and the ballistic step; the fused Pallas kernel computes the identical
    lanes in-kernel."""
    b = world.bodies
    lanes = control_lanes(
        world.bp.nb, tuple(b.pos[k] for k in range(3)),
        tuple(b.quat[k] for k in range(4)),
        tuple(b.size[k] * 0.5 for k in range(3)), b.radius,
        tuple(b.linvel[k] for k in range(3)),
        tuple(b.angvel[k] for k in range(3)),
        b.dynamic, world.bp.anchor, world.bp.anchor_quat, params, gather,
        comm=comm,
    )
    vec = jnp.concatenate([
        world.diagnostics.vec[:11],
        jnp.stack([jnp.asarray(v, jnp.float32) for v in lanes]),
    ])
    return world.replace(diagnostics=world.diagnostics.replace(vec=vec))


def _clamp_angular(w, max_speed):
    """80 rad/s hard clamp (solver.cpp:85-92)."""
    speed = jnp.linalg.norm(w, axis=-1, keepdims=True)
    scale = jnp.where(speed > max_speed, max_speed / jnp.maximum(speed, 1e-12), 1.0)
    return w * scale


def _world_inertia_components(quat_arr, diag):
    """I_w = R diag R^T as 6 upper-tri components (xx,xy,xz,yy,yz,zz);
    R's columns are the body axes (rigid.cpp:51-59)."""
    q = (quat_arr[:, 0], quat_arr[:, 1], quat_arr[:, 2], quat_arr[:, 3])
    axes = cm.q_axes(q)
    d = (diag[:, 0], diag[:, 1], diag[:, 2])
    comps = []
    for i, j in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)):
        comps.append(sum(d[k] * axes[k][i] * axes[k][j] for k in range(3)))
    return comps


def _sym33(comps):
    xx, xy, xz, yy, yz, zz = comps
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def body_tables(b):
    """Body state as (G, 128) component tables for the replicated core."""
    return {
        "pos": tuple(b.pos[k] for k in range(3)),
        "quat": tuple(b.quat[k] for k in range(4)),
        "half": tuple(b.size[k] * 0.5 for k in range(3)),
        "inv_mass": b.inv_mass,
        "friction": b.friction,
    }


def predict(b, params):
    """Phase 3: inertial prediction (solver.cpp:299-337).

    Operates in (N, 3) row views (the portable XLA path); the Pallas
    backend runs an equivalent component-form prediction in-kernel.
    Returns (linvel, angvel, inertial_pos, inertial_quat, pos_start,
    quat_start, sanitized)."""
    n = b.n
    dt = params.dt
    gravity = jnp.asarray(params.gravity, jnp.float32)
    sanitized = jnp.int32(0)
    dyn = b.dynamic.reshape(b.n)
    dynf = dyn[:, None].astype(jnp.float32)

    linvel, sanitized = _sanitize(b.linvel_n3, 0.0, sanitized)
    angvel = _clamp_angular(b.angvel_n3, params.max_angular_speed)
    angvel, sanitized = _sanitize(angvel, 0.0, sanitized)

    pos0 = b.pos_n3
    quat0 = b.quat_n4

    inertial_pos = jnp.where(dyn[:, None], pos0 + linvel * dt + gravity * dt * dt, pos0)
    omega_q = jnp.concatenate([angvel, jnp.zeros((n, 1))], axis=-1)
    inertial_quat = quat_normalize(quat0 + quat_mul(omega_q, quat0) * (0.5 * dt))
    inertial_quat = jnp.where(dyn[:, None], inertial_quat, quat0)

    g_len = float(sum(x * x for x in params.gravity) ** 0.5)
    if g_len > 1e-5:
        accel = (linvel - b._n3(b.prev_linvel)) / dt
        projected = accel @ (gravity / g_len)
        accel_weight = jnp.clip(projected / g_len, 0.0, 1.0)
        accel_weight = jnp.where(jnp.isfinite(accel_weight), accel_weight, 0.0)
    else:
        accel_weight = jnp.zeros((n,))

    pos_start = pos0 + (linvel * dt + gravity[None, :] * (accel_weight[:, None] * dt * dt)) * dynf
    pos_start, sanitized = _sanitize(pos_start, pos0, sanitized)
    return linvel, angvel, inertial_pos, inertial_quat, pos_start, inertial_quat, sanitized


def finalize(world, b, contacts, joints, springs, pos_f, quat_f, pos0, quat0,
             linvel, angvel, lam_c, sep_slots, once, overflow, sanitized,
             params, comm=None, degree_overflow=None):
    """Phases 5+6: velocity reconstruction + damping (solver.cpp:433-469)
    and diagnostics (solver.cpp:471-513).

    ``sep_slots``: (4, D, G, 128) raw contact separations at the final
    poses (the backend's last geometry evaluation).  ``once``: (D, G, 128)
    mask selecting exactly one replica per pair for counting.  ``comm``:
    collective seam — on a body-sharded world the diagnostics scalars are
    all-reduced so every shard carries the global values."""
    if comm is None:
        from .comm import LOCAL_COMM as comm
    n = b.n
    g = n // 128
    dt = params.dt
    dyn = b.dynamic
    dyn_n = dyn.reshape(n)
    new_linvel = (pos_f - pos0) / dt * params.linear_damping
    delta_q = quat_mul(quat_f, quat_conj(quat0))
    new_angvel = quat_vec_doubled(delta_q) / dt * params.angular_damping
    new_linvel = jnp.where(dyn_n[:, None], new_linvel, b.linvel_n3)
    new_angvel = jnp.where(dyn_n[:, None], new_angvel, b.angvel_n3)
    new_linvel, sanitized = _sanitize(new_linvel, 0.0, sanitized)
    new_angvel, sanitized = _sanitize(new_angvel, 0.0, sanitized)

    lin_speed = jnp.linalg.norm(new_linvel, axis=-1) * dyn_n
    ang_speed = jnp.linalg.norm(new_angvel, axis=-1) * dyn_n

    def cg(a):
        return jnp.moveaxis(a, 0, 1).reshape(a.shape[1], g, 128)

    bodies = b.replace(
        pos=cg(pos_f),
        quat=cg(quat_f),
        linvel=cg(new_linvel),
        angvel=cg(new_angvel),
        prev_linvel=jnp.where(dyn[None], cg(linvel), b.prev_linvel),
        prev_angvel=jnp.where(dyn[None], cg(angvel), b.prev_angvel),
    )

    valid = contacts.other >= 0
    max_pen = jnp.float32(0.0)
    max_violation = jnp.float32(0.0)
    max_lam_n = jnp.float32(0.0)
    for s in range(4):
        ok = (jnp.int32(s) < contacts.count) & valid
        sep = sep_slots[s]
        max_pen = jnp.maximum(max_pen, jnp.max(jnp.where(ok, -sep, 0.0), initial=0.0))
        max_violation = jnp.maximum(
            max_violation,
            jnp.max(jnp.where(ok, params.penetration_slop - sep, 0.0), initial=0.0),
        )
        max_lam_n = jnp.maximum(
            max_lam_n, jnp.max(jnp.where(ok, jnp.abs(lam_c[s * 3]), 0.0), initial=0.0)
        )

    from .state import make_diagnostics

    diag = make_diagnostics(
        max_penetration=comm.pmax(jnp.maximum(max_pen, 0.0)),
        max_constraint_violation=comm.pmax(jnp.maximum(max_violation, 0.0)),
        max_linear_speed=comm.pmax(jnp.max(lin_speed, initial=0.0)),
        max_angular_speed=comm.pmax(jnp.max(ang_speed, initial=0.0)),
        max_normal_impulse=comm.pmax(max_lam_n),
        active_contacts=comm.psum(jnp.sum(jnp.where(once, contacts.count, 0))),
        active_manifolds=comm.psum(
            jnp.sum((once & (contacts.count > 0)).astype(jnp.int32))
        ),
        dynamic_bodies=comm.psum(jnp.sum(dyn_n.astype(jnp.int32))),
        pair_overflow=overflow,
        degree_overflow=(jnp.int32(0) if degree_overflow is None
                         else comm.psum(degree_overflow)),
        sanitized=comm.psum(sanitized),
    )

    return world.replace(
        bodies=bodies,
        contacts=contacts,
        joints=joints,
        springs=springs,
        step_index=world.step_index + 1,
        diagnostics=diag,
    )


@functools.partial(jax.jit, static_argnames=("params", "cap"))
def step(world: World, params: SolverParams, cap: Capacity) -> World:
    # Fall-freeze pre-pass (config.fall_freeze_y): bodies that fell off the
    # world become static with zeroed velocities.  Applied before backend
    # dispatch so both backends and all cached gates see the same state.
    if params.fall_freeze_y > -1.0e8:
        b = world.bodies
        frozen = b.dynamic & (b.pos[1] < params.fall_freeze_y)
        # Traced; cheap no-op when nothing is frozen.
        world = world.replace(bodies=b.replace(
            linvel=jnp.where(frozen[None], 0.0, b.linvel),
            angvel=jnp.where(frozen[None], 0.0, b.angvel),
            inv_mass=jnp.where(frozen, 0.0, b.inv_mass),
        ))
    # Backend dispatch (trace-time static): the Pallas mega-kernel path
    # covers scenes (with or without joints/springs) up to 2048 bodies —
    # proven on hardware; at G=33 groups (4224 bodies) this environment's
    # Mosaic compile helper is OOM-killed even for a single kernel, so
    # bigger N uses the gridded Pallas tier (contact-only) or the portable
    # XLA path.
    supports_pallas = world.bodies.n <= 2048
    if cap.backend == "pallas":
        if not supports_pallas:
            raise ValueError(
                "backend='pallas' forced on an unsupported scene "
                f"(n={world.bodies.n}); the Pallas path covers scenes "
                "with <= 2048 bodies (Mosaic compile ceiling)"
            )
        use_pallas = True
    elif cap.backend == "xla":
        use_pallas = False
    else:
        use_pallas = supports_pallas and jax.default_backend() == "tpu"
    supports_grid = (
        world.bodies.n <= 16384
        and world.bodies.g % 8 == 0
        and world.joints.dj == 0
        and world.springs.ds == 0
    )
    if cap.backend == "grid" and not supports_grid:
        raise ValueError(
            "backend='grid' needs a contact-only scene with <= 16384 bodies "
            f"and G % 8 == 0 (n={world.bodies.n}, G={world.bodies.g})"
        )
    use_grid = (not use_pallas) and supports_grid and (
        cap.backend == "grid"
        or (cap.backend == "auto" and jax.default_backend() == "tpu")
    )

    if use_grid:
        from . import solver_tpu

        return solver_tpu.step_grid(world, params, cap)

    # One broadphase refresh decision per step, scalar-gated on the carried
    # control block (lanes 14/15); both backends below trust world.bp.
    dv = world.diagnostics.vec
    bp, refreshed = refresh_scalar(
        world.bp, dv, world.bodies, world.exclusions, cap.max_degree,
        params.bp_margin, window=cap.bp_window,
    )
    world = world.replace(bp=bp)

    def dispatch(w):
        if use_pallas:
            from . import solver_tpu

            return solver_tpu.step_pallas(w, params, cap, refreshed=refreshed)
        return _step_impl(w, params, cap, rep.xla_gather, refreshed=refreshed)

    # Ballistic fast path: when the previous step ended with zero contacts
    # and its control block PROVES narrowphase yields none at the current
    # poses (min candidate AABB gap > collision margin — lane 13 — with no
    # candidate capacity drop), the step's exact result is the inertial
    # target and the whole iterative solve is skipped.  All scalar logic;
    # refresh steps conservatively run the full solve (the lane was
    # computed against the previous candidate lists).
    ballistic_able = (
        params.ballistic
        and world.joints.dj == 0
        and world.springs.ds == 0
        and (supports_pallas or jax.default_backend() != "tpu")
    )
    if not ballistic_able:
        return dispatch(world)

    ballistic_ok = (
        (dv[5] == 0.0)
        & (dv[13] > params.collision_margin)
        & jnp.logical_not(refreshed)
        & (bp.dropped == 0)
    )
    return lax.cond(
        ballistic_ok, lambda w: _ballistic_step(w, params, cap), dispatch,
        world,
    )


def _ballistic_step(world: World, params: SolverParams, cap: Capacity) -> World:
    """Contact-free step: with zero active constraint rows the primal fixed
    point is exactly the inertial target (solver.cpp:344-409 with no force
    terms reduces to x <- x_tilde on the first iteration), so the iterative
    solve is skipped entirely.  Caller guarantees (via control lane 13)
    that narrowphase at these poses produces no contacts and that the
    previous step's contact cache is empty."""
    b = world.bodies
    linvel, angvel, inertial_pos, inertial_quat, _ps, _qs, sanitized = predict(
        b, params
    )
    d, g = world.contacts.other.shape[0], b.g
    sep = jnp.zeros((4, d, g, 128), jnp.float32)
    once = jnp.zeros((d, g, 128), bool)
    out = finalize(
        world, b, world.contacts, world.joints, world.springs,
        inertial_pos, inertial_quat, b.pos_n3, b.quat_n4,
        linvel, angvel, world.contacts.lam, sep, once,
        jnp.int32(0), sanitized, params,
    )
    # Refill the control block on the new state so the NEXT step's gates
    # stay scalar (on TPU via the tiny Mosaic probe kernel — an XLA gather
    # over the (D, G, 128) slot indices would cost milliseconds here).
    if jax.default_backend() == "tpu":
        from . import solver_tpu

        lanes = solver_tpu.control_lanes_tpu(out.bp.nb, out.bodies, out.bp, params)
        vec = jnp.concatenate([out.diagnostics.vec[:11], lanes])
        return out.replace(diagnostics=out.diagnostics.replace(vec=vec))
    return attach_control(out, params)


def _step_impl(world: World, params: SolverParams, cap: Capacity, gather,
               comm=None, refreshed=None) -> World:
    """Portable whole-step implementation.

    ``comm`` (avbd3d_tpu.comm): collective seam.  With the default
    LocalComm every call is the identity and this is the single-device
    XLA path.  Inside ``parallel.sharded``'s shard_map the same code runs
    on this shard's (G_loc, 128) body rows: partner reads go through an
    all-gather-backed ``gather``, step-level gates and diagnostics are
    all-reduced, and own-body indices are offset to global ids.

    ``refreshed``: the broadphase-refresh flag when the caller (solver.step)
    already ran the scalar-gated refresh; None = do it here (direct callers
    like parallel.sharded).  The control block is replica-identical after
    the all-reduces in control_lanes, so the scalar gates take the same
    branch on every shard."""
    if comm is None:
        from .comm import LOCAL_COMM as comm
    b = world.bodies
    n = b.n
    g = n // 128
    dt = params.dt
    tables = body_tables(b)
    sharded = comm.n_shards > 1
    own_iota = (rep.body_iota(g) + comm.row0(n)) if sharded else None
    n_total = n * comm.n_shards

    # ------------------------------------------------------------------
    # Phase 1: broadphase (solver.cpp:261-270) — margin-enlarged candidate
    # lists cached until the carried anchor-deviation scalars break the
    # superset bound, then the symmetric capacity filter (ops/broadphase).
    # ------------------------------------------------------------------
    if refreshed is None:
        bp, refreshed = refresh_scalar(
            world.bp, world.diagnostics.vec, b, world.exclusions,
            cap.max_degree, params.bp_margin, comm=comm,
            window=0 if comm.n_shards > 1 else cap.bp_window,
        )
        world = world.replace(bp=bp)
    else:
        bp = world.bp
    neighbors, kept = symmetric_filter(
        bp.nb, bp.key, bp.thr, b.dynamic, gather,
        own_iota=own_iota, n_total=n_total if sharded else None,
    )
    overflow = bp.cand - comm.psum(kept)

    # ------------------------------------------------------------------
    # Phase 2: narrowphase + warmstart + decay (solver.cpp:273-296)
    # ------------------------------------------------------------------
    contacts, man_dropped = rep.collide_and_init(
        world.contacts, neighbors, tables, params, gather, own_iota=own_iota
    )
    joints = joint_decay(world.joints, params)
    springs = spring_decay(world.springs, params)
    consts = rep.pair_constants(contacts.other, tables, gather)

    # ------------------------------------------------------------------
    # Phase 3: inertial prediction (solver.cpp:299-337)
    # ------------------------------------------------------------------
    dyn = b.dynamic.reshape(n)
    dynf = dyn[:, None].astype(jnp.float32)
    linvel, angvel, inertial_pos, inertial_quat, pos_start, quat_start, sanitized = predict(b, params)
    pos0 = b.pos_n3
    quat0 = b.quat_n4

    # ------------------------------------------------------------------
    # Phase 4: iterative solve (solver.cpp:340-431)
    # ------------------------------------------------------------------
    inv_dt2 = 1.0 / (dt * dt)
    mass = b.mass.reshape(n)
    has_joints = joints.dj > 0
    has_springs = springs.ds > 0
    pen_s = springs.penalty  # static within the step (soft rows never ramp)
    eye = jnp.eye(3)

    def pose_dict(pos, quat):
        return {
            "pos": tuple(pos[:, k].reshape(g, 128) for k in range(3)),
            "quat": tuple(quat[:, k].reshape(g, 128) for k in range(4)),
        }

    def flat(comps):
        return jnp.stack([c.reshape(n) for c in comps], axis=-1)

    def assemble_and_solve(pos, quat, geom, f_rows, cmat, jacc, sacc):
        iw = _world_inertia_components(quat, b._n3(b.inertia))
        i_world = _sym33(iw)

        rhs_l = mass[:, None] * (pos - inertial_pos) * inv_dt2
        q_err = quat_mul(quat, quat_conj(inertial_quat))
        rot_err = quat_vec_doubled(q_err)
        rhs_a = jnp.einsum("nij,nj->ni", i_world, rot_err) * inv_dt2

        forces = rep.body_forces(geom, f_rows)
        rhs_l += flat(forces["F"])
        rhs_a += flat(forces["T"])
        m_ll = _sym33([c.reshape(n) for c in cmat[:6]])
        m_la = jnp.stack([c.reshape(n) for c in cmat[6:15]], axis=-1).reshape(n, 3, 3)
        m_aa = _sym33([c.reshape(n) for c in cmat[15:21]])
        gyro = flat(cmat[21:24])

        # Joint/spring contributions (replicated accumulation, always
        # fresh — they are per-color re-evaluated, unlike the cached
        # contact Hessian).
        for acc in (jacc, sacc):
            if acc is not None:
                rhs_l += flat(acc["F"])
                rhs_a += flat(acc["T"])
                m_ll = m_ll + _sym33([c.reshape(n) for c in acc["m_ll"]])
                m_la = m_la + jnp.stack(
                    [c.reshape(n) for c in acc["m_la"]], axis=-1
                ).reshape(n, 3, 3)
                m_aa = m_aa + _sym33([c.reshape(n) for c in acc["m_aa"]])

        lhs_ll = m_ll + eye[None] * (mass * inv_dt2)[:, None, None]
        lhs_la = m_la
        lhs_al = jnp.swapaxes(m_la, -1, -2)
        lhs_aa = m_aa + i_world * inv_dt2 + eye[None] * gyro[:, :, None]

        dl, da = solve66(lhs_ll, lhs_la, lhs_al, lhs_aa, rhs_l, rhs_a)
        return dl, da

    total_iters = params.iterations + (1 if params.post_stabilize else 0)

    # Impact iteration boost (config.impact_iterations): energetic
    # near-contact steps run extra Jacobi sweeps — the parallel primal
    # needs ~2x the reference's Gauss-Seidel sweep count to hold the
    # penetration envelope through landing transients.  Bit-identical
    # when the scene already runs >= impact_iterations (boost is False
    # at trace time and nothing below changes).
    stale_ok_gate, calm = control_gates(world.diagnostics.vec, refreshed, params)
    boost = 0 < params.iterations < params.impact_iterations
    if boost:
        # Global (unrefined) speed gate: during a coherent landing the
        # bodies fall TOGETHER, so the near-contact refinement (relative
        # reach per slot) can stay calm through the compression steps
        # where the extra sweeps are needed — measured on Stack: refined
        # gate worst transient 0.0093, global gate 0.0004.
        n_main = jnp.where(calm, params.iterations, params.impact_iterations)
        iters_end = n_main + (1 if params.post_stabilize else 0)
    else:
        n_main = params.iterations
        iters_end = total_iters

    def iteration(it, carry, rebuild, ramp_pen=True):
        pos, quat, geom, lam_c, pen_c, stick, lam_j, pen_j, san, cmat = carry
        if params.post_stabilize:
            alpha_cur = jnp.where(it < n_main, 1.0, 0.0)
        else:
            alpha_cur = jnp.float32(params.alpha)

        # --- primal (solver.cpp:344-409); geometry was evaluated at these
        # exact poses at the end of the previous iteration ---
        # Contacts are Jacobi (all bodies see the iteration-start snapshot);
        # joints/springs are Gauss-Seidel across the colored joint graph:
        # one sub-pass per color, each re-evaluating joint/spring rows at
        # the newest poses, applied only to that color's bodies.  With no
        # joints there is exactly one pass (pure Jacobi, zero overhead).
        crs = rep.eval_rows(geom, contacts, consts, lam_c, pen_c, stick, alpha_cur, params)
        f_c = rep.primal_force(crs, pen_c)
        relax = params.relaxation

        # Contact Hessian: rebuilt on the block head, reused in between
        # (joint/spring LHS parts below stay per-iteration fresh — they are
        # small and re-evaluated per color sub-pass anyway).  ``rebuild`` is
        # True (static, always rebuild) or a traced bool — the latter wraps
        # the rebuild in one small lax.cond so the iteration body is traced
        # exactly once per step graph (the old duplicated phase4(k)/phase4(1)
        # cond doubled the step graph and with it XLA compile time).
        def _fresh_cmat(_):
            iiw = _world_inertia_components(quat, b._n3(b.inv_inertia))
            iiw_g = [c.reshape(g, 128) for c in iiw]
            m = rep.body_matrix(geom, f_c, pen_c, iiw_g)
            return tuple(m["m_ll"] + m["m_la"] + m["m_aa"] + m["gyro"])

        if rebuild is True:
            cmat = _fresh_cmat(None)
        else:
            cmat = lax.cond(rebuild, _fresh_cmat, lambda _: cmat, operand=None)

        n_colors = cap.joint_colors if (has_joints or has_springs) else 1
        color_arr = joints.color.reshape(n)
        new_pos, new_quat = pos, quat
        for c in range(n_colors):
            jacc = sacc = None
            if has_joints:
                jgeom = joint_geometry(joints, pose_dict(new_pos, new_quat), gather)
                f_j = joint_force(jgeom, joints, lam_j, pen_j)
                jacc = joint_accumulate(jgeom, f_j, pen_j)
            if has_springs:
                sgeom = spring_geometry(springs, pose_dict(new_pos, new_quat), gather)
                f_s = spring_force(sgeom, pen_s)
                sacc = spring_accumulate(sgeom, f_s, pen_s)

            dl, da = assemble_and_solve(new_pos, new_quat, geom, f_c, cmat, jacc, sacc)
            apply = dyn & (color_arr == c) if n_colors > 1 else dyn
            cand_pos = new_pos - relax * dl
            dq = jnp.concatenate([da * relax, jnp.zeros((n, 1))], axis=-1)
            cand_quat = quat_normalize(new_quat - quat_mul(dq, new_quat) * 0.5)
            new_pos = jnp.where(apply[:, None], cand_pos, new_pos)
            new_quat = jnp.where(apply[:, None], cand_quat, new_quat)
        new_pos, san = _sanitize(new_pos, pos, san)
        new_quat, san = _sanitize(new_quat, quat, san)

        # --- dual (solver.cpp:411-429) at the post-primal poses; the same
        # geometry evaluation feeds the next iteration's primal ---
        geom2 = rep.eval_geometry(
            contacts, pose_dict(new_pos, new_quat), consts, gather, own_iota
        )
        crs2 = rep.eval_rows(
            geom2, contacts, consts, jnp.stack(crs["lam"]), pen_c,
            jnp.stack(crs["stick"]), alpha_cur, params,
        )
        lam_c2, pen_c2, stick2 = rep.dual_update(crs2, geom2, pen_c, params.beta, params)
        if has_joints:
            jgeom2 = joint_geometry(joints, pose_dict(new_pos, new_quat), gather)
            lam_j2, pen_j2 = joint_dual(jgeom2, joints, lam_j, pen_j,
                                        params.beta, params)
        else:
            lam_j2, pen_j2 = lam_j, pen_j

        do_dual = it < n_main
        lam_c = jnp.where(do_dual, lam_c2, jnp.stack(crs2["lam"]))
        # Contact penalty ramps only when the Hessian rebuilds before its
        # next use (augmented-Lagrangian cadence — see solver_tpu for the
        # stability rationale; k=1 ramps every iteration, reference-exact).
        # Joint/spring LHS parts are always fresh, so their ramp cadence is
        # untouched.  ``ramp_pen`` may be traced (data-dependent cadence).
        pen_c = jnp.where(do_dual & ramp_pen, pen_c2, pen_c)
        stick = jnp.where(do_dual, stick2, jnp.stack(crs2["stick"]))
        lam_j = jnp.where(do_dual, lam_j2, lam_j)
        pen_j = jnp.where(do_dual, pen_j2, pen_j)
        return (new_pos, new_quat, geom2, lam_c, pen_c, stick, lam_j, pen_j,
                san, cmat)

    geom0 = rep.eval_geometry(
        contacts, pose_dict(pos_start, quat_start), consts, gather, own_iota
    )
    zmat = tuple(jnp.zeros((g, 128), jnp.float32) for _ in range(24))
    carry0 = (
        pos_start,
        quat_start,
        geom0,
        contacts.lam,
        contacts.penalty,
        contacts.stick,
        joints.lam,
        joints.penalty,
        sanitized,
        zmat,
    )
    k_re = max(1, params.lhs_rebuild_every)
    if k_re > 1:
        # Speed-gated staleness (see config.lhs_rebuild_every) as a traced
        # boolean folded into ONE iteration body: calm steps rebuild the
        # Hessian on block heads only (it % k == 0) and ramp the penalty at
        # block tails; energetic near-contact steps (``fresh``) rebuild and
        # ramp every iteration — exactly the k=1 cadence.  The former
        # lax.cond between two whole phase-4 graphs doubled the traced step
        # graph (and XLA compile time) for identical values.
        fresh = jnp.logical_not(stale_ok_gate)
        k_fr = max(1, params.lhs_fresh_rebuild_every)

        def loop_body(it, c):
            j = it % k_re
            rb_st = j == 0
            rp_st = (j == k_re - 1) | (it == iters_end - 1)
            if k_fr == 1:
                rb = rb_st | fresh
                rp = rp_st | fresh
            else:
                jf = it % k_fr
                rb = jnp.where(fresh, jf == 0, rb_st)
                rp = jnp.where(
                    fresh, (jf == k_fr - 1) | (it == iters_end - 1), rp_st
                )
            return iteration(it, c, rebuild=rb, ramp_pen=rp)

        carry = lax.fori_loop(0, iters_end, loop_body, carry0)
    else:

        def loop_body(it, c):
            return iteration(it, c, rebuild=True, ramp_pen=True)

        carry = lax.fori_loop(0, iters_end, loop_body, carry0)
    pos_f, quat_f, _geom, lam_c, pen_c, stick, lam_j, pen_j, sanitized, _ = carry

    # Slow once-per-step joint dual tracker (ops/joints.joint_dual_ema):
    # lambda converges to the constraint force without the chain
    # divergence of the per-iteration ascent.
    if has_joints and params.joint_ema_rate > 0.0:
        jgeom_f = joint_geometry(joints, pose_dict(pos_f, quat_f), gather)
        lam_j = joint_dual_ema(jgeom_f, joints, lam_j, pen_j, params)

    contacts = contacts.replace(lam=lam_c, penalty=pen_c, stick=stick)
    joints = joints.replace(lam=lam_j, penalty=pen_j)

    # Final-pose separations for diagnostics from one more geometry eval.
    geom_f = rep.eval_geometry(
        contacts, pose_dict(pos_f, quat_f), consts, gather, own_iota
    )
    sep_slots = jnp.stack(geom_f["sep"])

    # Count each pair at one replica: the lower-index side, or the dynamic
    # side when the partner is static (static bodies own no slots).
    valid = consts["valid"]
    other_dyn = gather(dyn.astype(jnp.float32).reshape(g, 128), consts["idx"]) > 0.5
    own_n = rep.body_iota(g) if own_iota is None else own_iota
    once = valid & ((own_n[None] < consts["idx"]) | ~other_dyn)

    out = finalize(
        world, b, contacts, joints, springs, pos_f, quat_f, pos0, quat0,
        linvel, angvel, lam_c, sep_slots, once, overflow, sanitized, params,
        comm=comm, degree_overflow=man_dropped,
    )
    # Control block for the next step's scalar gates (lanes 11-15),
    # evaluated on the final state against the candidate lists just used.
    return attach_control(out, params, gather=gather, comm=comm)


@functools.partial(jax.jit, static_argnames=("params", "cap", "n_steps"))
def run_steps(world: World, params: SolverParams, cap: Capacity, n_steps: int) -> World:
    """Advance ``n_steps`` on-device in one dispatch (lax.scan over step)."""

    def body(w, _):
        return step.__wrapped__(w, params, cap), None

    world, _ = lax.scan(body, world, None, length=n_steps)
    return world
