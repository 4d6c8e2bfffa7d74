"""Distance spring constraints: one soft row C = |pA - pB| - rest.

TPU-native rebuild of ``source/spring.cpp``.  Springs are always soft
(finite stiffness), so under the solver's rules their penalty is clamped to
the stiffness each step (solver.cpp:290-292), lambda is excluded from the
primal force (solver.cpp:379) and never dual-updated (solver.cpp:416-417) —
the steady-state force is penalty * C = stiffness * C, i.e. a classic
penalty spring.

The reference also computes a geometric-stiffness Hessian H_ll that the
solver never consumes (spring.cpp:46-55, 87-89); we intentionally omit dead
state but keep the Jacobian math identical.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..maths import cross, length, quat_rotate
from ..state import Springs


def spring_decay(springs: Springs, params) -> Springs:
    """Phase-2 penalty decay + soft clamp (solver.cpp:281-293)."""
    penalty = jnp.clip(springs.penalty * params.gamma, params.penalty_min, params.penalty_max)
    penalty = jnp.minimum(penalty, springs.stiffness)
    return springs.replace(penalty=penalty)


def spring_row_state(springs: Springs, pos, quat):
    """computeConstraint + Jacobian direction (spring.cpp:33-90)."""
    has_a = springs.body_a >= 0
    a_idx = jnp.maximum(springs.body_a, 0)
    b_idx = springs.body_b

    q_a = jnp.where(has_a[:, None], quat[a_idx], jnp.asarray([0.0, 0.0, 0.0, 1.0]))
    rw_a = jnp.where(has_a[:, None], quat_rotate(q_a, springs.r_a), jnp.zeros_like(springs.r_a))
    p_a = jnp.where(has_a[:, None], pos[a_idx] + rw_a, springs.r_a)
    rw_b = quat_rotate(quat[b_idx], springs.r_b)
    p_b = pos[b_idx] + rw_b

    delta = p_a - p_b
    cur_len = length(delta)
    degenerate = cur_len < 1.0e-6
    n = delta / jnp.where(degenerate, 1.0, cur_len)[:, None]
    n = jnp.where(degenerate[:, None], 0.0, n)

    c = jnp.where(springs.active, cur_len - springs.rest, 0.0)
    return {
        "C": c,
        "n": n,
        "rw_a": rw_a,
        "rw_b": rw_b,
        "has_a": has_a,
        "active": springs.active,
    }


def spring_primal_force(row_state, penalty):
    """Soft row: f = penalty * C (lambda excluded, bounds infinite)."""
    return jnp.where(row_state["active"], penalty * row_state["C"], 0.0)


def spring_jacobians(row_state, side):
    """J_lin = sign * n, J_ang = sign * (r_world x n)  (spring.cpp:59-90)."""
    sign = 1.0 if side > 0 else -1.0
    n = row_state["n"]
    rw = row_state["rw_a"] if side > 0 else row_state["rw_b"]
    j_lin = n * sign
    j_ang = cross(rw, n) * sign
    if side > 0:
        mask = row_state["has_a"][:, None]
        j_lin = jnp.where(mask, j_lin, 0.0)
        j_ang = jnp.where(mask, j_ang, 0.0)
    return j_lin, j_ang
