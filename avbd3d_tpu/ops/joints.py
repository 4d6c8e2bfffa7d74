"""Weld joint constraints: 6 rows (3 linear + 3 angular), replicated layout.

TPU-native rebuild of ``source/joint.cpp``.  Row semantics:
  rows 0-2: world anchor coincidence  C = pA - pB          (joint.cpp:69-86)
  rows 3-5: relative-orientation drift C = 2 * vec(q_rel * conj(q_rest))
            (joint.cpp:88-99 — note the reference does NOT sign-correct w
            here; we preserve that)
A world-side A (``world`` flag) has identity orientation, its anchor is a
world point, and a zero Jacobian (joint.cpp:74-80, 113-116).

All functions operate on the replicated (DJ, G, 128) body-major slot form
(state.Joints): each endpoint body owns a slot; slot math is expressed in
the joint's own A/B frame, so both replicas compute bit-identical values
and the lam/penalty updates need no cross-replica communication — the same
scheme as the contact cache (ops/replicated.py).  The only cross-body data
movement is the partner-pose fetch through the injected ``gather``.

Soft rows (finite stiffness) follow the solver's soft-constraint rules:
penalty clamped to the stiffness, lambdaWarm excluded from the primal
force, and no dual update (solver.cpp:290-292, 379, 416-417).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import cm
from ..state import Joints
from .replicated import gather_comps

_IDENT = (0.0, 0.0, 0.0, 1.0)


def _row_stiff(j: Joints):
    """Per-row stiffness: rows 0-2 linear, rows 3-5 angular."""
    return [j.stiff_lin] * 3 + [j.stiff_ang] * 3


def joint_decay(joints: Joints, params) -> Joints:
    """Phase-2 warmstart decay (solver.cpp:281-293) for joint rows.

    With the slow end-of-step dual tracker on (config.joint_ema_rate),
    hard rows skip the alpha*gamma lambda decay: the tracker IS the
    forgetting mechanism (when the load vanishes, C goes negative-ward and
    lambda relaxes at the same eta rate), and keeping the decay would
    shift the tracker's fixed point well below the true constraint force
    (see ops/joints.joint_dual_ema)."""
    if joints.dj == 0:
        return joints
    stiff = jnp.stack(_row_stiff(joints))
    soft = (stiff > 0.0) & jnp.isfinite(stiff)
    lam = joints.lam
    if not params.post_stabilize:
        dec = lam * (params.alpha * params.gamma)
        lam = jnp.where(soft, dec, lam) if params.joint_ema_rate > 0.0 else dec
    pen = jnp.clip(
        joints.penalty * params.gamma, params.penalty_min, params.joint_penalty_cap
    )
    pen = jnp.where(soft, jnp.minimum(pen, stiff), pen)
    valid = (joints.other >= 0)[None]
    return joints.replace(lam=jnp.where(valid, lam, 0.0), penalty=pen)


def joint_geometry(j: Joints, pose, gather):
    """Slot geometry at the given poses (joint.cpp:68-106).

    ``pose``: dict with 'pos' (3 comps) / 'quat' (4 comps), each (G, 128).
    Returns C rows (6), own-side world lever arm, A/B lever arms (for the
    dual gain), masks.  Every output is replica-identical by construction.
    """
    valid = j.other >= 0
    idx = jnp.where(valid, j.other, 0)
    is_a = j.side > 0
    is_world = j.world > 0

    own_pos = tuple(c[None] for c in pose["pos"])
    own_quat = tuple(c[None] for c in pose["quat"])
    oth_pos = gather_comps(pose["pos"], idx, gather)
    oth_quat = gather_comps(pose["quat"], idx, gather)

    anchor_a = tuple(j.anchor_a[k] for k in range(3))
    anchor_b = tuple(j.anchor_b[k] for k in range(3))
    rest = tuple(j.rest[k] for k in range(4))

    pa_body = cm.where(is_a, own_pos, oth_pos)
    qa_body = cm.where(is_a, own_quat, oth_quat)
    ident = tuple(jnp.full_like(qa_body[0], _IDENT[k]) for k in range(4))
    qa = cm.where(is_world, ident, qa_body)
    rw_a = cm.where(
        is_world,
        (jnp.zeros_like(pa_body[0]),) * 3,
        cm.q_rotate(qa, anchor_a),
    )
    p_a = cm.where(is_world, anchor_a, cm.add(pa_body, rw_a))

    pb_body = cm.where(is_a, oth_pos, own_pos)
    qb = cm.where(is_a, oth_quat, own_quat)
    rw_b = cm.q_rotate(qb, anchor_b)
    p_b = cm.add(pb_body, rw_b)

    lin_c = cm.sub(p_a, p_b)
    q_rel = cm.q_mul((-qa[0], -qa[1], -qa[2], qa[3]), qb)
    dq = cm.q_mul(q_rel, (-rest[0], -rest[1], -rest[2], rest[3]))
    ang_c = (2.0 * dq[0], 2.0 * dq[1], 2.0 * dq[2])

    zero = jnp.zeros_like(lin_c[0])
    c_rows = [
        jnp.where(valid, lin_c[0], zero),
        jnp.where(valid, lin_c[1], zero),
        jnp.where(valid, lin_c[2], zero),
        jnp.where(valid, ang_c[0], zero),
        jnp.where(valid, ang_c[1], zero),
        jnp.where(valid, ang_c[2], zero),
    ]
    rw_own = cm.where(is_a, rw_a, rw_b)
    return {
        "C": c_rows,
        "rw_a": rw_a,
        "rw_b": rw_b,
        "rw_own": rw_own,
        "valid": valid,
        "is_a": is_a,
        "is_world": is_world,
    }


def joint_force(geom, j: Joints, lam, pen):
    """f = penalty*C + lambdaWarm + motor per row (solver.cpp:379-381);
    soft rows drop lambda; weld bounds are infinite (joint.cpp:102-105)."""
    stiff = _row_stiff(j)
    out = []
    for r in range(6):
        hard = ~jnp.isfinite(stiff[r])
        lam_warm = jnp.where(hard, lam[r], 0.0)
        f = pen[r] * geom["C"][r] + lam_warm + j.rmotor[r]
        out.append(jnp.where(geom["valid"], f, 0.0))
    return out


def joint_accumulate(geom, f_rows, pen):
    """Own-side generalized force + 6x6 Hessian contributions, reduced over
    the DJ axis (solver.cpp:375-398 applied to joint rows).

    Rows 0-2: J_lin = sign*e_k, J_ang = sign*(rw_own x e_k).
    Rows 3-5: J_lin = 0,        J_ang = sign*e_k.   (joint.cpp:108-139)
    Quadratic terms drop the sign.  Returns per-body (G, 128) components
    F(3), T(3), m_ll(6), m_la(9), m_aa(6).
    """
    sign = jnp.where(geom["is_a"], 1.0, -1.0)
    okf = geom["valid"].astype(jnp.float32)
    rw = geom["rw_own"]

    f_lin = (f_rows[0] * okf, f_rows[1] * okf, f_rows[2] * okf)
    f_ang = (f_rows[3] * okf, f_rows[4] * okf, f_rows[5] * okf)

    F = [sign * f_lin[k] for k in range(3)]
    tv = cm.cross(rw, f_lin)
    T = [sign * (tv[k] + f_ang[k]) for k in range(3)]

    # c_k = rw x e_k: c_0 = (0, rw_z, -rw_y), c_1 = (-rw_z, 0, rw_x),
    # c_2 = (rw_y, -rw_x, 0).
    zero = jnp.zeros_like(rw[0])
    c = [
        (zero, rw[2], -rw[1]),
        (-rw[2], zero, rw[0]),
        (rw[1], -rw[0], zero),
    ]
    p = [pen[r] * okf for r in range(6)]

    m_ll = [p[0], zero, zero, p[1], zero, p[2]]
    # m_la[i*3+j] = sum_r pen_r * J_lin_r[i] * J_ang_r[j]; lin rows have
    # J_lin = e_r so row i takes pen_i * c_i.
    m_la = []
    for i in range(3):
        for k in range(3):
            m_la.append(p[i] * c[i][k])
    m_aa = [
        p[0] * c[0][0] * c[0][0] + p[1] * c[1][0] * c[1][0] + p[2] * c[2][0] * c[2][0] + p[3],
        p[0] * c[0][0] * c[0][1] + p[1] * c[1][0] * c[1][1] + p[2] * c[2][0] * c[2][1],
        p[0] * c[0][0] * c[0][2] + p[1] * c[1][0] * c[1][2] + p[2] * c[2][0] * c[2][2],
        p[0] * c[0][1] * c[0][1] + p[1] * c[1][1] * c[1][1] + p[2] * c[2][1] * c[2][1] + p[4],
        p[0] * c[0][1] * c[0][2] + p[1] * c[1][1] * c[1][2] + p[2] * c[2][1] * c[2][2],
        p[0] * c[0][2] * c[0][2] + p[1] * c[1][2] * c[1][2] + p[2] * c[2][2] * c[2][2] + p[5],
    ]

    return {
        "F": [jnp.sum(x, axis=0) for x in F],
        "T": [jnp.sum(x, axis=0) for x in T],
        "m_ll": [jnp.sum(x, axis=0) for x in m_ll],
        "m_la": [jnp.sum(x, axis=0) for x in m_la],
        "m_aa": [jnp.sum(x, axis=0) for x in m_aa],
    }


def joint_dual(geom, j: Joints, lam, pen, beta, params):
    """Dual ascent + penalty ramp for hard joint rows at the post-primal
    poses (solver.cpp:411-429: weld bounds are infinite so
    lambda += penalty*C, and the row is always "active" so the penalty
    always ramps).  Replica-identical.

    Stability: the per-iteration ascent diverges under a Jacobi primal on
    stiff chains at ANY rate — including with an iteration-stationarity
    gate (measured round 4: a chain's Jacobi contraction is ~(1 - 1/L^2)
    per iteration, so an unconverged residual looks "stationary" and the
    gate admits 20 integrations of it per step; lambda reached 4e12 on
    RodJointed).  The lambda rate therefore stays a knob defaulting to
    penalty-only; the sound ascent is the once-per-step slow tracker
    (``joint_dual_ema``), on by default."""
    stiff = _row_stiff(j)
    lam_new, pen_new = [], []
    for r in range(6):
        hard = ~jnp.isfinite(stiff[r]) & geom["valid"]
        lam_r = jnp.where(
            hard, lam[r] + params.joint_dual_rate * pen[r] * geom["C"][r], lam[r]
        )
        # rowPenaltyGain weights (solver.cpp:94-125): both bodies' J.
        if r < 3:
            def cross_e(rw, k=r):
                # rw x e_k in closed form
                z = jnp.zeros_like(rw[0])
                return [(z, rw[2], -rw[1]), (-rw[2], z, rw[0]),
                        (rw[1], -rw[0], z)][k]

            ca = cross_e(geom["rw_a"])
            cb = cross_e(geom["rw_b"])
            worldf = geom["is_world"].astype(jnp.float32)
            lin_w = 2.0 - worldf
            ang_w = cm.length_sq(ca) * (1.0 - worldf) + cm.length_sq(cb)
        else:
            lin_w = jnp.zeros_like(pen[r])
            ang_w = 2.0 - geom["is_world"].astype(jnp.float32)
        total = lin_w + ang_w
        gain = jnp.where(
            total < 1.0e-8,
            beta,
            (beta * lin_w + beta * params.angular_beta_scale * ang_w)
            / jnp.maximum(total, 1.0e-8),
        )
        pen_r = jnp.where(
            hard,
            jnp.minimum(pen[r] + gain * jnp.abs(geom["C"][r]), params.joint_penalty_cap),
            pen[r],
        )
        lam_new.append(lam_r)
        pen_new.append(pen_r)
    return jnp.stack(lam_new), jnp.stack(pen_new)


def joint_dual_ema(geom, j: Joints, lam, pen, params):
    """Once-per-step slow dual ascent on hard joint rows
    (config.joint_ema_rate) at the FINAL (post-solve) poses.

    Why this form: the per-iteration AL ascent integrates 10-20 unconverged
    Jacobi residuals per step and diverges on chains at any rate, gated or
    not (ops/joints.joint_dual docstring); and penalty-only chains never
    come fully to rest — the beta-ramp/gamma-decay limit cycle keeps a
    standing micro-stretch oscillation (measured on RodJointed: maxLin
    breathes 0.01-0.16 forever) — so a rest-gated ascent has nothing sound
    to fire on either.  Instead, hard rows SKIP the phase-2 lambda decay
    (joint_decay) and integrate once per step at a slow rate:

        lambda += eta * penalty * C_final

    At quasi-static force balance ``lambda + penalty*C = T`` this is
    ``lambda += eta*(T - lambda)`` — an exponential tracker with fixed
    point EXACTLY the constraint force T and time constant 1/eta steps; C
    shrinks to T*(residual)/penalty as lambda takes the load.  Divergence
    is structurally impossible: per-step growth is bounded by eta times the
    physical row force.  Validated on RodJointed (tools/joint_dual_study.py,
    2000 steps): at iterations=20 the chain comes fully to rest (maxLin
    1e-4 — the lambda warmstart itself cures the penalty-ramp limit cycle)
    and every link's lambda matches the analytic chain tension within 0.6%.
    Caveat: the fixed point is "the force that holds the chain's REALIZED
    per-step configuration" — with an unconverged primal (10 Jacobi
    iterations on a 15-link chain) the standing oscillation biases lambda
    to ~6.5x the static tension, still bounded and stable.  Long chains
    should run iterations >= 20 (scene_rod_jointed does).

    Deviation from solver.cpp:411-429 (per-iteration ascent + alpha*gamma
    decay) is deliberate and measured: the reference NaNs on its own rod
    scene (PARITY.md)."""
    eta = params.joint_ema_rate
    stiff = _row_stiff(j)
    out = []
    for r in range(6):
        hard = ~jnp.isfinite(stiff[r]) & geom["valid"]
        out.append(jnp.where(hard, lam[r] + eta * pen[r] * geom["C"][r], lam[r]))
    return jnp.stack(out)
