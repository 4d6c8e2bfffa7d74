"""The AVBD step: one pure, jit-compiled function over the whole world.

TPU-native rebuild of ``Solver::step`` (solver.cpp:255-514).  The reference's
six phases map as:

  1. Broadphase              -> masked all-pairs sphere test + static pair list
  2. Init/warmstart forces   -> vmapped narrowphase + sorted-key cache merge
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

Aggregation strategy: constraint rows are evaluated once per iteration in
pair space, then each body gathers its incident rows through a per-step
(N, D) incidence table and reduces densely — no scatters inside the hot
loop.  The per-body 6x6 LHS is assembled from row outer products and solved
with the batched LDL/Schur kernel (maths.solve66), mirroring
solver.cpp:344-409 math exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .config import Capacity, SolverParams
from .maths import (
    cross,
    outer3,
    quat_conj,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_mat3,
    quat_vec_doubled,
    solve66,
)
from .ops.broadphase import build_incidence, decode_keys, sphere_pairs
from .ops.contacts import (
    contact_dual_update,
    contact_geometry,
    contact_primal_force,
    contact_rows,
    match_and_init,
)
from .ops.joints import (
    joint_decay,
    joint_dual_update,
    joint_jacobians,
    joint_primal_force,
    joint_row_state,
)
from .ops.narrowphase import collide_pairs
from .ops.springs import (
    spring_decay,
    spring_jacobians,
    spring_primal_force,
    spring_row_state,
)
from .state import Diagnostics, World, zero_diagnostics


def _sanitize(x, default, count):
    """NaN/Inf reset-with-counter: the in-jit version of sanitizeVec3/Quat
    (solver.cpp:41-66).  Counts affected rows instead of printf-ing."""
    finite = jnp.all(jnp.isfinite(x), axis=-1)
    fixed = jnp.where(finite[..., None], x, default)
    return fixed, count + jnp.sum((~finite).astype(jnp.int32))


def _clamp_angular(w, max_speed):
    """80 rad/s hard clamp (solver.cpp:85-92)."""
    speed = jnp.linalg.norm(w, axis=-1, keepdims=True)
    scale = jnp.where(speed > max_speed, max_speed / jnp.maximum(speed, 1e-12), 1.0)
    return w * scale


@functools.partial(jax.jit, static_argnames=("params", "cap"))
def step(world: World, params: SolverParams, cap: Capacity) -> World:
    b = world.bodies
    n = b.n
    dt = params.dt
    gravity = jnp.asarray(params.gravity, jnp.float32)
    sanitized = jnp.int32(0)

    # ------------------------------------------------------------------
    # Phase 1: broadphase (solver.cpp:261-270)
    # ------------------------------------------------------------------
    keys, pair_overflow = sphere_pairs(b.pos, b.radius, world.exclusion_keys, cap.max_pairs)
    ia, ib, pair_valid = decode_keys(keys, n)

    # ------------------------------------------------------------------
    # Phase 2: narrowphase + warmstart + decay (solver.cpp:273-296)
    # ------------------------------------------------------------------
    geom = collide_pairs(
        b.pos, b.quat, b.size, ia, ib, pair_valid, margin=params.collision_margin
    )
    contacts = match_and_init(world.contacts, keys, geom, b.pos, b.quat, params)
    joints = joint_decay(world.joints, params)
    springs = spring_decay(world.springs, params)

    inc, inc_sign, degree_overflow = build_incidence(
        ia, ib, geom["count"] > 0, world.bodies.dynamic, n, cap.max_degree
    )

    # ------------------------------------------------------------------
    # Phase 3: inertial prediction (solver.cpp:299-337)
    # ------------------------------------------------------------------
    dyn = b.dynamic
    dynf = dyn[:, None].astype(jnp.float32)

    linvel, sanitized = _sanitize(b.linvel, 0.0, sanitized)
    angvel = _clamp_angular(b.angvel, params.max_angular_speed)
    angvel, sanitized = _sanitize(angvel, 0.0, sanitized)

    pos0 = b.pos
    quat0 = b.quat

    inertial_pos = jnp.where(dyn[:, None], pos0 + linvel * dt + gravity * dt * dt, pos0)
    omega_q = jnp.concatenate([angvel, jnp.zeros((n, 1))], axis=-1)
    inertial_quat = quat_normalize(quat0 + quat_mul(omega_q, quat0) * (0.5 * dt))
    inertial_quat = jnp.where(dyn[:, None], inertial_quat, quat0)

    # Adaptive gravity weight from measured acceleration (solver.cpp:319-325).
    g_len = float(sum(g * g for g in params.gravity) ** 0.5)
    if g_len > 1e-5:
        accel = (linvel - b.prev_linvel) / dt
        projected = accel @ (gravity / g_len)
        accel_weight = jnp.clip(projected / g_len, 0.0, 1.0)
        accel_weight = jnp.where(jnp.isfinite(accel_weight), accel_weight, 0.0)
    else:
        accel_weight = jnp.zeros((n,))

    pos_start = pos0 + (linvel * dt + gravity[None, :] * (accel_weight[:, None] * dt * dt)) * dynf
    pos_start, sanitized = _sanitize(pos_start, pos0, sanitized)
    quat_start = inertial_quat

    # ------------------------------------------------------------------
    # Phase 4: iterative solve (solver.cpp:340-431)
    # ------------------------------------------------------------------
    inv_dt2 = 1.0 / (dt * dt)
    mass = b.mass
    has_joints = joints.incidence.shape[1] > 0
    has_springs = springs.incidence.shape[1] > 0

    p_cap = cap.max_pairs
    d_cap = cap.max_degree
    # Precompute side-selecting gather indices: rows of pair p seen from side
    # A index into [0, P), from side B into [P, 2P) of concatenated buffers.
    inc_ok = inc >= 0
    pc = jnp.where(inc_ok, inc, 0)
    side_idx = pc + jnp.where(inc_sign < 0.0, p_cap, 0)          # (N, D)
    sgnf = inc_sign                                              # (N, D) +/-1, 0 invalid

    def assemble_and_solve(pos, quat, geom, crs, f_c, pen_c, jrs, f_j, pen_j, srs, f_s, pen_s):
        rot = quat_to_mat3(quat)
        i_world = jnp.einsum("nij,nj,nkj->nik", rot, b.inertia, rot)
        ii_world = jnp.einsum("nij,nj,nkj->nik", rot, b.inv_inertia, rot)

        eye = jnp.eye(3)
        rhs_l = mass[:, None] * (pos - inertial_pos) * inv_dt2
        q_err = quat_mul(quat, quat_conj(inertial_quat))
        rot_err = quat_vec_doubled(q_err)
        rhs_a = jnp.einsum("nij,nj->ni", i_world, rot_err) * inv_dt2

        # ---- contact rows through the (N, D) incidence table ----
        # One gather per quantity; the A/B side select is folded into the
        # gather index over concatenated [A; B] buffers.
        crs_basis_flat = geom["basis"].reshape(p_cap, 12, 3)
        rw_ab = jnp.concatenate([geom["rw_a"], geom["rw_b"]], axis=0)  # (2P, 4, 3)
        basis = crs_basis_flat[pc]                               # (N, D, 12, 3)
        rw = rw_ab[side_idx]                                     # (N, D, 4, 3)
        w = (geom["row_ok"][pc] & inc_ok[..., None, None]).astype(jnp.float32).reshape(n, d_cap, 12)
        f = f_c.reshape(p_cap, 12)[pc] * w                       # (N, D, 12)
        pen = pen_c[pc] * w

        rw12 = jnp.repeat(rw, 3, axis=2)                         # (N, D, 12, 3)
        sgn = sgnf[..., None, None]
        j_lin = sgn * basis
        j_ang = sgn * cross(rw12, basis)
        j6 = jnp.concatenate([j_lin, j_ang], axis=-1).reshape(n, d_cap * 12, 6)
        f_r = f.reshape(n, d_cap * 12)
        pen_r = pen.reshape(n, d_cap * 12)

        rhs6 = jnp.einsum("nrk,nr->nk", j6, f_r)
        rhs_l += rhs6[:, :3]
        rhs_a += rhs6[:, 3:]
        m66 = jnp.einsum("nrk,nrl->nkl", j6 * pen_r[..., None], j6)

        lhs_ll = m66[:, :3, :3] + eye[None] * (mass * inv_dt2)[:, None, None]
        lhs_la = m66[:, :3, 3:]
        lhs_al = m66[:, 3:, :3]
        lhs_aa = m66[:, 3:, 3:] + i_world * inv_dt2

        # Gyroscopic diagonal regularizer, manifolds only (solver.cpp:393-397).
        j_ang_r = j6[:, :, 3:]
        iiw_ja = jnp.einsum("nij,nrj->nri", ii_world, j_ang_r)
        gyro = jnp.abs(cross(j_ang_r, iiw_ja)) * jnp.abs(f_r)[..., None]
        gyro_diag = jnp.sum(gyro, axis=1)                        # (N, 3)
        lhs_aa += eye[None] * gyro_diag[:, :, None]

        # ---- joint rows (precomputed incidence) ----
        if has_joints:
            jidx = joints.incidence
            jok = jidx >= 0
            jc = jnp.where(jok, jidx, 0)
            jl_a, ja_a = joint_jacobians(jrs, +1)
            jl_b, ja_b = joint_jacobians(jrs, -1)
            is_a = (joints.inc_side > 0)[..., None, None]
            jl = jnp.where(is_a, jl_a[jc], jl_b[jc])             # (N, DJ, 6, 3)
            ja = jnp.where(is_a, ja_a[jc], ja_b[jc])
            wj = (jok[..., None] & jrs["active"][jc][..., None]).astype(jnp.float32)
            fj = f_j[jc] * wj
            pj = pen_j[jc] * wj
            rhs_l += jnp.einsum("ndri,ndr->ni", jl, fj)
            rhs_a += jnp.einsum("ndri,ndr->ni", ja, fj)
            lhs_ll += jnp.einsum("ndr,ndri,ndrj->nij", pj, jl, jl)
            lhs_la += jnp.einsum("ndr,ndri,ndrj->nij", pj, jl, ja)
            lhs_al += jnp.einsum("ndr,ndri,ndrj->nij", pj, ja, jl)
            lhs_aa += jnp.einsum("ndr,ndri,ndrj->nij", pj, ja, ja)

        # ---- spring rows ----
        if has_springs:
            sidx = springs.incidence
            sok = sidx >= 0
            sc = jnp.where(sok, sidx, 0)
            sl_a, sa_a = spring_jacobians(srs, +1)
            sl_b, sa_b = spring_jacobians(srs, -1)
            is_a = (springs.inc_side > 0)[..., None]
            sl = jnp.where(is_a, sl_a[sc], sl_b[sc])             # (N, DS, 3)
            sa = jnp.where(is_a, sa_a[sc], sa_b[sc])
            ws = (sok & srs["active"][sc]).astype(jnp.float32)
            fs = f_s[sc] * ws
            ps = pen_s[sc] * ws
            rhs_l += jnp.einsum("ndi,nd->ni", sl, fs)
            rhs_a += jnp.einsum("ndi,nd->ni", sa, fs)
            lhs_ll += jnp.einsum("nd,ndi,ndj->nij", ps, sl, sl)
            lhs_la += jnp.einsum("nd,ndi,ndj->nij", ps, sl, sa)
            lhs_al += jnp.einsum("nd,ndi,ndj->nij", ps, sa, sl)
            lhs_aa += jnp.einsum("nd,ndi,ndj->nij", ps, sa, sa)

        dl, da = solve66(lhs_ll, lhs_la, lhs_al, lhs_aa, rhs_l, rhs_a)
        return dl, da

    total_iters = params.iterations + (1 if params.post_stabilize else 0)

    def iteration(it, carry):
        pos, quat, geom, lam_c, pen_c, stick, lam_j, pen_j, san = carry
        if params.post_stabilize:
            alpha_cur = jnp.where(it < params.iterations, 1.0, 0.0)
        else:
            alpha_cur = jnp.float32(params.alpha)

        # --- primal (solver.cpp:344-409); geometry was evaluated at these
        # exact poses at the end of the previous iteration ---
        crs = contact_rows(geom, contacts, lam_c, pen_c, stick, alpha_cur, params)
        f_c = contact_primal_force(crs, pen_c)
        jrs = joint_row_state(joints, pos, quat, lam_j)
        f_j = joint_primal_force(jrs, pen_j)
        srs = spring_row_state(springs, pos, quat)
        f_s = spring_primal_force(srs, springs.penalty)

        dl, da = assemble_and_solve(
            pos, quat, geom, crs, f_c, pen_c, jrs, f_j, pen_j, srs, f_s, springs.penalty
        )
        relax = params.relaxation
        new_pos = pos - relax * dl * dynf
        dq = jnp.concatenate([da * relax, jnp.zeros((n, 1))], axis=-1)
        new_quat = quat_normalize(quat - quat_mul(dq, quat) * 0.5)
        new_quat = jnp.where(dyn[:, None], new_quat, quat)
        new_pos, san = _sanitize(new_pos, pos, san)
        new_quat, san = _sanitize(new_quat, quat, san)

        # --- dual (solver.cpp:411-429) at the post-primal poses; the same
        # geometry evaluation feeds the next iteration's primal ---
        geom2 = contact_geometry(contacts, new_pos, new_quat, b.inv_mass, b.friction)
        crs2 = contact_rows(
            geom2, contacts, crs["lam"].reshape(-1, 12), pen_c, crs["stick"], alpha_cur, params
        )
        lam_c2, pen_c2, stick2 = contact_dual_update(crs2, geom2, pen_c, params.beta, params)
        jrs2 = joint_row_state(joints, new_pos, new_quat, lam_j)
        lam_j2, pen_j2 = joint_dual_update(jrs2, pen_j, params.beta, params)

        # The dual update is skipped on the post-stabilize extra iteration.
        do_dual = it < params.iterations
        lam_c = jnp.where(do_dual, lam_c2, crs2["lam"].reshape(-1, 12))
        pen_c = jnp.where(do_dual, pen_c2, pen_c)
        stick = jnp.where(do_dual, stick2, crs2["stick"])
        lam_j = jnp.where(do_dual, lam_j2, lam_j)
        pen_j = jnp.where(do_dual, pen_j2, pen_j)
        return new_pos, new_quat, geom2, lam_c, pen_c, stick, lam_j, pen_j, san

    geom0 = contact_geometry(contacts, pos_start, quat_start, b.inv_mass, b.friction)
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
    )
    pos_f, quat_f, _geom, lam_c, pen_c, stick, lam_j, pen_j, sanitized = lax.fori_loop(
        0, total_iters, iteration, carry0
    )

    contacts = contacts.replace(lam=lam_c, penalty=pen_c, stick=stick)
    joints = joints.replace(lam=lam_j, penalty=pen_j)

    # ------------------------------------------------------------------
    # Phase 5: velocity reconstruction + damping (solver.cpp:433-469)
    # ------------------------------------------------------------------
    new_linvel = (pos_f - pos0) / dt * params.linear_damping
    delta_q = quat_mul(quat_f, quat_conj(quat0))
    new_angvel = quat_vec_doubled(delta_q) / dt * params.angular_damping
    new_linvel = jnp.where(dyn[:, None], new_linvel, b.linvel)
    new_angvel = jnp.where(dyn[:, None], new_angvel, b.angvel)
    new_linvel, sanitized = _sanitize(new_linvel, 0.0, sanitized)
    new_angvel, sanitized = _sanitize(new_angvel, 0.0, sanitized)

    lin_speed = jnp.linalg.norm(new_linvel, axis=-1) * dyn
    ang_speed = jnp.linalg.norm(new_angvel, axis=-1) * dyn

    bodies = b.replace(
        pos=pos_f,
        quat=quat_f,
        linvel=new_linvel,
        angvel=new_angvel,
        prev_linvel=jnp.where(dyn[:, None], linvel, b.prev_linvel),
        prev_angvel=jnp.where(dyn[:, None], angvel, b.prev_angvel),
    )

    # ------------------------------------------------------------------
    # Phase 6: diagnostics (solver.cpp:471-513)
    # ------------------------------------------------------------------
    ia_c, ib_c, pv = decode_keys(contacts.key, n)
    slot_ok = (jnp.arange(4)[None, :] < contacts.count[:, None]) & pv[:, None]
    p_a = pos_f[ia_c][:, None, :] + quat_rotate(quat_f[ia_c][:, None, :], contacts.r_a)
    p_b = pos_f[ib_c][:, None, :] + quat_rotate(quat_f[ib_c][:, None, :], contacts.r_b)
    sep = jnp.sum((p_a - p_b) * contacts.normal, axis=-1)
    pen_depth = jnp.where(slot_ok, jnp.maximum(0.0, -sep), 0.0)
    violation = jnp.where(slot_ok, jnp.maximum(0.0, params.penetration_slop - sep), 0.0)
    lam_n = jnp.abs(contacts.lam.reshape(-1, 4, 3)[..., 0]) * slot_ok

    diag = Diagnostics(
        max_penetration=jnp.max(pen_depth, initial=0.0),
        max_constraint_violation=jnp.max(violation, initial=0.0),
        max_linear_speed=jnp.max(lin_speed, initial=0.0),
        max_angular_speed=jnp.max(ang_speed, initial=0.0),
        max_normal_impulse=jnp.max(lam_n, initial=0.0),
        active_contacts=jnp.sum(contacts.count),
        active_manifolds=jnp.sum((contacts.count > 0).astype(jnp.int32)),
        dynamic_bodies=jnp.sum(dyn.astype(jnp.int32)),
        pair_overflow=pair_overflow,
        degree_overflow=degree_overflow,
        sanitized=sanitized,
    )

    return world.replace(
        bodies=bodies,
        contacts=contacts,
        joints=joints,
        springs=springs,
        step_index=world.step_index + 1,
        diagnostics=diag,
    )


@functools.partial(jax.jit, static_argnames=("params", "cap", "n_steps"))
def run_steps(world: World, params: SolverParams, cap: Capacity, n_steps: int) -> World:
    """Advance ``n_steps`` on-device in one dispatch (lax.scan over step).

    The headless C++ loop dispatches one step per frame; on TPU the
    host->device round trip would dominate at these step times, so the
    benchmark/throughput path runs whole step blocks per launch.
    """

    def body(w, _):
        return step.__wrapped__(w, params, cap), None

    world, _ = lax.scan(body, world, None, length=n_steps)
    return world
