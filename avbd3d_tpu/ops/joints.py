"""Weld joint constraints: 6 rows (3 linear + 3 angular).

TPU-native rebuild of ``source/joint.cpp``.  Row semantics:
  rows 0-2: world anchor coincidence  C = pA - pB          (joint.cpp:69-86)
  rows 3-5: relative-orientation drift C = 2 * vec(q_rel * conj(q_rest))
            (joint.cpp:88-99 — note the reference does NOT sign-correct w
            here; we preserve that)
``body_a == -1`` is a body-to-world joint: the world side has identity
orientation, anchor ``r_a`` interpreted as a world point, and a zero Jacobian
(joint.cpp:74-80, 113-116).

Soft rows (finite stiffness) follow the solver's soft-constraint rules:
penalty clamped to the stiffness, lambdaWarm excluded from the primal force,
and no dual update (solver.cpp:290-292, 379, 416-417).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..maths import cross, quat_conj, quat_mul, quat_rotate
from ..state import Joints


def joint_decay(joints: Joints, params) -> Joints:
    """Phase-2 warmstart decay (solver.cpp:281-293) for joint rows."""
    lam = joints.lam
    if not params.post_stabilize:
        lam = lam * (params.alpha * params.gamma)
    penalty = jnp.clip(
        joints.penalty * params.gamma, params.penalty_min, params.joint_penalty_cap
    )
    stiff = jnp.stack([joints.stiffness_lin] * 3 + [joints.stiffness_ang] * 3, axis=-1)
    soft = (stiff > 0.0) & jnp.isfinite(stiff)
    penalty = jnp.where(soft, jnp.minimum(penalty, stiff), penalty)
    return joints.replace(lam=lam * joints.active[:, None], penalty=penalty)


def joint_row_state(joints: Joints, pos, quat, lam):
    """computeConstraint for all joints (joint.cpp:68-106).

    Returns C (J, 6), the world anchor arms rw_a/rw_b (J, 3), hardness mask,
    and per-side validity.
    """
    has_a = joints.body_a >= 0
    a_idx = jnp.maximum(joints.body_a, 0)
    b_idx = joints.body_b

    q_a = jnp.where(
        has_a[:, None], quat[a_idx], jnp.asarray([0.0, 0.0, 0.0, 1.0])
    )
    rw_a = jnp.where(has_a[:, None], quat_rotate(q_a, joints.r_a), jnp.zeros_like(joints.r_a))
    p_a = jnp.where(has_a[:, None], pos[a_idx] + rw_a, joints.r_a)
    rw_b = quat_rotate(quat[b_idx], joints.r_b)
    p_b = pos[b_idx] + rw_b

    lin_c = p_a - p_b
    q_rel = quat_mul(quat_conj(q_a), quat[b_idx])
    dq = quat_mul(q_rel, quat_conj(joints.rest_rel_quat))
    ang_c = 2.0 * dq[..., :3]
    c_rows = jnp.concatenate([lin_c, ang_c], axis=-1)
    c_rows = jnp.where(joints.active[:, None], c_rows, 0.0)

    stiff = jnp.stack([joints.stiffness_lin] * 3 + [joints.stiffness_ang] * 3, axis=-1)
    hard = ~jnp.isfinite(stiff)
    return {
        "C": c_rows,
        "hard": hard,
        "rw_a": rw_a,
        "rw_b": rw_b,
        "has_a": has_a,
        "lam": lam,
        "motor": joints.motor,
        "active": joints.active,
    }


def joint_primal_force(row_state, penalty):
    """f = clamp(penalty*C + lambdaWarm + motor, -inf, inf); soft rows drop
    lambda (solver.cpp:379-381).  Bounds are infinite for weld joints
    (joint.cpp:102-105)."""
    lam_warm = jnp.where(row_state["hard"], row_state["lam"], 0.0)
    f = penalty * row_state["C"] + lam_warm + row_state["motor"]
    return jnp.where(row_state["active"][:, None], f, 0.0)


def joint_jacobians(row_state, side):
    """Per-row J_lin/J_ang (J, 6, 3) for the given side (+1 = A, -1 = B).

    Rows 0-2: J_lin = sign * e_k, J_ang = sign * (r_world x e_k).
    Rows 3-5: J_lin = 0,          J_ang = sign * e_k.   (joint.cpp:108-139)
    """
    j = row_state["C"].shape[0]
    eye = jnp.eye(3)
    rw = row_state["rw_a"] if side > 0 else row_state["rw_b"]
    sign = 1.0 if side > 0 else -1.0
    j_lin_lin = jnp.broadcast_to(eye, (j, 3, 3)) * sign
    j_ang_lin = cross(rw[:, None, :], jnp.broadcast_to(eye, (j, 3, 3))) * sign
    j_lin_ang = jnp.zeros((j, 3, 3))
    j_ang_ang = jnp.broadcast_to(eye, (j, 3, 3)) * sign
    j_lin = jnp.concatenate([j_lin_lin, j_lin_ang], axis=1)   # (J, 6, 3)
    j_ang = jnp.concatenate([j_ang_lin, j_ang_ang], axis=1)
    if side > 0:
        # World side contributes nothing (joint.cpp:113-116).
        mask = row_state["has_a"][:, None, None]
        j_lin = jnp.where(mask, j_lin, 0.0)
        j_ang = jnp.where(mask, j_ang, 0.0)
    return j_lin, j_ang


def joint_dual_update(row_state, penalty, beta, params):
    """Per-iteration dual ascent + penalty ramp for hard joint rows
    (solver.cpp:411-429: lambda = clamp(penalty*C + lambda, fmin, fmax);
    weld bounds are infinite so lambda += penalty*C, and the row is always
    "active" so the penalty always ramps).

    Stability note: this full-rate ascent is divergent under a pure-Jacobi
    primal (the mid-iteration residual of a stiff chain alternates in sign
    along the chain and accumulation feeds back explosively — measured
    divergent even at 0.1x rate).  The solver therefore runs Gauss-Seidel
    color sub-passes over the joint graph (see solver._step_impl), which
    restores the reference's convergence structure; joint_dual_rate
    additionally under-relaxes the ascent if needed (1.0 = reference)."""
    hard = row_state["hard"] & row_state["active"][:, None]
    lam_new = jnp.where(
        hard,
        row_state["lam"] + params.joint_dual_rate * penalty * row_state["C"],
        row_state["lam"],
    )

    # rowPenaltyGain weights (solver.cpp:94-125).
    jl_a, ja_a = joint_jacobians(row_state, +1)
    jl_b, ja_b = joint_jacobians(row_state, -1)
    lin_w = jnp.sum(jl_a * jl_a, axis=-1) + jnp.sum(jl_b * jl_b, axis=-1)
    ang_w = jnp.sum(ja_a * ja_a, axis=-1) + jnp.sum(ja_b * ja_b, axis=-1)
    total = lin_w + ang_w
    gain = jnp.where(
        total < 1.0e-8,
        beta,
        (beta * lin_w + beta * params.angular_beta_scale * ang_w) / jnp.maximum(total, 1.0e-8),
    )
    pen_new = jnp.where(
        hard,
        jnp.minimum(penalty + gain * jnp.abs(row_state["C"]), params.joint_penalty_cap),
        penalty,
    )
    return lam_new, pen_new
