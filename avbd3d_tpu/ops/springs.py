"""Distance spring constraints: one soft row C = |pA - pB| - rest.

TPU-native rebuild of ``source/spring.cpp`` on the replicated (DS, G, 128)
body-major slot layout (see state.Springs / ops/joints.py for the scheme).
Springs are always soft (finite stiffness), so under the solver's rules
their penalty is clamped to the stiffness each step (solver.cpp:290-292),
lambda is excluded from the primal force (solver.cpp:379) and never
dual-updated (solver.cpp:416-417) — the steady-state force is
penalty * C, i.e. a classic penalty spring.

The reference also computes a geometric-stiffness Hessian H_ll that the
solver never consumes (spring.cpp:46-55, 87-89); we intentionally omit dead
state but keep the Jacobian math identical.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import cm
from ..state import Springs
from .replicated import gather_comps


def spring_decay(springs: Springs, params) -> Springs:
    """Phase-2 penalty decay + soft clamp (solver.cpp:281-293)."""
    if springs.ds == 0:
        return springs
    pen = jnp.clip(springs.penalty * params.gamma, params.penalty_min, params.penalty_max)
    pen = jnp.minimum(pen, springs.rstiff)
    return springs.replace(penalty=pen)


def spring_geometry(s: Springs, pose, gather):
    """computeConstraint + Jacobian direction (spring.cpp:33-90), per slot.
    Replica-identical by construction."""
    valid = s.other >= 0
    idx = jnp.where(valid, s.other, 0)
    is_a = s.side > 0
    is_world = s.world > 0

    own_pos = tuple(c[None] for c in pose["pos"])
    own_quat = tuple(c[None] for c in pose["quat"])
    oth_pos = gather_comps(pose["pos"], idx, gather)
    oth_quat = gather_comps(pose["quat"], idx, gather)

    anchor_a = tuple(s.anchor_a[k] for k in range(3))
    anchor_b = tuple(s.anchor_b[k] for k in range(3))

    pa_body = cm.where(is_a, own_pos, oth_pos)
    qa_body = cm.where(is_a, own_quat, oth_quat)
    ident = (jnp.zeros_like(qa_body[0]),) * 3 + (jnp.ones_like(qa_body[0]),)
    qa = cm.where(is_world, ident, qa_body)
    rw_a = cm.where(
        is_world, (jnp.zeros_like(pa_body[0]),) * 3, cm.q_rotate(qa, anchor_a)
    )
    p_a = cm.where(is_world, anchor_a, cm.add(pa_body, rw_a))

    pb_body = cm.where(is_a, oth_pos, own_pos)
    qb = cm.where(is_a, oth_quat, own_quat)
    rw_b = cm.q_rotate(qb, anchor_b)
    p_b = cm.add(pb_body, rw_b)

    delta = cm.sub(p_a, p_b)
    cur_len = cm.length(delta)
    degenerate = cur_len < 1.0e-6
    inv = 1.0 / jnp.where(degenerate, 1.0, cur_len)
    n = tuple(jnp.where(degenerate, 0.0, d * inv) for d in delta)

    c = jnp.where(valid, cur_len - s.rrest, 0.0)
    rw_own = cm.where(is_a, rw_a, rw_b)
    return {
        "C": c,
        "n": n,
        "rw_own": rw_own,
        "valid": valid,
        "is_a": is_a,
    }


def spring_force(geom, pen):
    """Soft row: f = penalty * C (lambda excluded, bounds infinite)."""
    return jnp.where(geom["valid"], pen * geom["C"], 0.0)


def spring_accumulate(geom, f, pen):
    """Own-side force + Hessian contributions, reduced over DS
    (J_lin = sign*n, J_ang = sign*(rw_own x n), spring.cpp:59-90)."""
    sign = jnp.where(geom["is_a"], 1.0, -1.0)
    okf = geom["valid"].astype(jnp.float32)
    n = geom["n"]
    rw = geom["rw_own"]
    c = cm.cross(rw, n)
    fs = f * okf
    p = pen * okf

    F = [sign * n[k] * fs for k in range(3)]
    T = [sign * c[k] * fs for k in range(3)]
    m_ll = [p * n[0] * n[0], p * n[0] * n[1], p * n[0] * n[2],
            p * n[1] * n[1], p * n[1] * n[2], p * n[2] * n[2]]
    m_la = []
    for i in range(3):
        for k in range(3):
            m_la.append(p * n[i] * c[k])
    m_aa = [p * c[0] * c[0], p * c[0] * c[1], p * c[0] * c[2],
            p * c[1] * c[1], p * c[1] * c[2], p * c[2] * c[2]]

    return {
        "F": [jnp.sum(x, axis=0) for x in F],
        "T": [jnp.sum(x, axis=0) for x in T],
        "m_ll": [jnp.sum(x, axis=0) for x in m_ll],
        "m_la": [jnp.sum(x, axis=0) for x in m_la],
        "m_aa": [jnp.sum(x, axis=0) for x in m_aa],
    }
