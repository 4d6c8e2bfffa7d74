"""Contact manifold constraints: warmstart transfer + AVBD row math.

TPU-native rebuild of ``source/manifold.cpp``.  The reference stores contacts
inside heap-allocated ``Manifold`` forces and transfers lambda/penalty/anchor
state by exact feature-id matching when a manifold re-initializes
(manifold.cpp:71-175).  Here the persistent state lives in the fixed-capacity
``Contacts`` pair-slot cache; cross-step pair identity is a sorted-key merge
(``jnp.searchsorted``) and the 4x4 within-pair feature matching is a small
unrolled masked loop.

Row layout per pair: 12 rows = 4 contacts x (normal, tangent1, tangent2),
matching getRowCount() (manifold.cpp:66-69).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..maths import cross, dot, normalize_or, quat_rotate
from ..state import Contacts, INACTIVE_KEY


def contact_basis(normal):
    """Deterministic orthonormal basis from a contact normal.

    Mirrors buildContactBasis (manifold.cpp:39-50): fallback +Y normal,
    tangent1 from the dominant-component rule, tangent2 = n x t1.
    normal (..., 3) -> (n, t1, t2) each (..., 3).
    """
    up = jnp.asarray([0.0, 1.0, 0.0])
    n = normalize_or(normal, up)
    cond = (jnp.abs(n[..., 0]) >= jnp.abs(n[..., 2]))[..., None]
    t1_a = jnp.stack([-n[..., 1], n[..., 0], jnp.zeros_like(n[..., 0])], axis=-1)
    t1_b = jnp.stack([jnp.zeros_like(n[..., 0]), -n[..., 2], n[..., 1]], axis=-1)
    t1 = normalize_or(jnp.where(cond, t1_a, t1_b), jnp.asarray([1.0, 0.0, 0.0]))
    t2 = normalize_or(cross(n, t1), jnp.asarray([0.0, 0.0, 1.0]))
    return n, t1, t2


def _world_points(pos, quat, ia, ib, r_a, r_b):
    """World contact points for per-pair local anchors (P, 4, 3)."""
    p_a = pos[ia][:, None, :] + quat_rotate(quat[ia][:, None, :], r_a)
    p_b = pos[ib][:, None, :] + quat_rotate(quat[ib][:, None, :], r_b)
    return p_a, p_b


def match_and_init(old: Contacts, keys, geom, pos, quat, params) -> Contacts:
    """Phase-2 manifold initialize + warmstart (manifold.cpp:71-175) plus the
    solver's warmstart decay loop (solver.cpp:281-293), fully vectorized.

    ``old`` is last step's cache; ``keys`` the new sorted pair keys; ``geom``
    the narrowphase output for those pairs.  Poses are the *pre-prediction*
    poses, matching the reference call order (initialize runs before body
    prediction).
    """
    n = pos.shape[0]
    p = keys.shape[0]
    valid_pair = keys != INACTIVE_KEY
    safe_keys = jnp.where(valid_pair, keys, 0)
    ia = safe_keys // n
    ib = safe_keys % n

    # ---- cross-step pair matching (sorted-key merge) ----
    loc = jnp.clip(jnp.searchsorted(old.key, keys), 0, old.key.shape[0] - 1)
    pair_matched = (old.key[loc] == keys) & valid_pair

    o_feature = old.feature[loc]
    o_r_a = old.r_a[loc]
    o_r_b = old.r_b[loc]
    o_normal = old.normal[loc]
    o_stick = old.stick[loc]
    o_lam = old.lam[loc].reshape(p, 4, 3)
    o_penalty = old.penalty[loc].reshape(p, 4, 3)
    o_count = jnp.where(pair_matched, old.count[loc], 0)
    o_slot_ok = (jnp.arange(4)[None, :] < o_count[:, None]) & (o_feature >= 0)

    new_feature = geom["feature"]
    new_slot_ok = geom["slot_ok"]
    r_a = geom["r_a"]
    r_b = geom["r_b"]
    normal = geom["normal"]

    # World midpoints at current poses for the drift gates
    # (manifold.cpp:128-133).
    np_a, np_b = _world_points(pos, quat, ia, ib, r_a, r_b)
    op_a, op_b = _world_points(pos, quat, ia, ib, o_r_a, o_r_b)
    new_mid = (np_a + np_b) * 0.5
    old_mid = (op_a + op_b) * 0.5

    up = jnp.asarray([0.0, 1.0, 0.0])
    new_n_unit = normalize_or(normal, up)
    old_n_unit = normalize_or(o_normal, new_n_unit)

    # ---- greedy first-unused exact-feature match, 4 new x 4 old ----
    # (manifold.cpp:109-119): new contacts scan old contacts in order and
    # claim the first unused slot with an identical feature id.
    used = jnp.zeros((p, 4), bool)
    match_idx = []
    match_ok = []
    for i in range(4):
        eligible = (
            (o_feature == new_feature[:, i : i + 1])
            & o_slot_ok
            & ~used
            & new_slot_ok[:, i : i + 1]
        )
        j = jnp.argmax(eligible, axis=1)
        found = jnp.take_along_axis(eligible, j[:, None], axis=1)[:, 0]
        used = used | (jnp.arange(4)[None, :] == j[:, None]) & found[:, None]
        match_idx.append(j)
        match_ok.append(found)
    match_idx = jnp.stack(match_idx, axis=1)   # (P, 4) old slot per new slot
    match_ok = jnp.stack(match_ok, axis=1)     # (P, 4)

    m_old_n = jnp.take_along_axis(old_n_unit, match_idx[..., None], axis=1)
    m_old_mid = jnp.take_along_axis(old_mid, match_idx[..., None], axis=1)
    m_old_stick = jnp.take_along_axis(o_stick, match_idx, axis=1)
    m_old_r_a = jnp.take_along_axis(o_r_a, match_idx[..., None], axis=1)
    m_old_r_b = jnp.take_along_axis(o_r_b, match_idx[..., None], axis=1)
    m_old_lam = jnp.take_along_axis(o_lam, match_idx[..., None], axis=1)
    m_old_pen = jnp.take_along_axis(o_penalty, match_idx[..., None], axis=1)

    normal_dot = dot(new_n_unit, m_old_n)
    drift_sq = jnp.sum((new_mid - m_old_mid) ** 2, axis=-1)

    # Warmstart gates (manifold.cpp:132-133).
    warm = (
        match_ok
        & (normal_dot >= params.warmstart_normal_min_dot)
        & (drift_sq <= params.warmstart_max_drift**2)
    )
    lam = jnp.where(warm[..., None], m_old_lam, 0.0)
    penalty = jnp.where(
        warm[..., None],
        jnp.clip(m_old_pen, params.penalty_min, params.manifold_penalty_cap),
        params.penalty_min,
    )

    # Stick-anchor reuse gates (manifold.cpp:144-156).
    reuse = (
        warm
        & m_old_stick
        & (normal_dot >= params.stick_normal_min_dot)
        & (drift_sq <= params.stick_anchor_max_drift**2)
    )
    stick = m_old_stick & reuse
    r_a = jnp.where(reuse[..., None], m_old_r_a, r_a)
    r_b = jnp.where(reuse[..., None], m_old_r_b, r_b)

    # ---- alpha-stabilization cache at pre-step poses (manifold.cpp:159-171)
    n_unit, t1, t2 = contact_basis(normal)
    p_a, p_b = _world_points(pos, quat, ia, ib, r_a, r_b)
    delta = p_a - p_b
    c0_n = dot(delta, n_unit) - params.normal_contact_margin
    c0_t = jnp.stack([dot(delta, t1), dot(delta, t2)], axis=-1)

    # ---- warmstart decay (solver.cpp:281-293); contact rows are hard so the
    # soft-stiffness clamp never applies here.
    if not params.post_stabilize:
        lam = lam * (params.alpha * params.gamma)
    penalty = jnp.clip(penalty * params.gamma, params.penalty_min, params.penalty_max)

    count = geom["count"]
    return Contacts(
        key=keys,
        count=count,
        feature=new_feature,
        r_a=r_a,
        r_b=r_b,
        normal=n_unit,
        stick=stick,
        c0_n=c0_n,
        c0_t=c0_t,
        lam=(lam * new_slot_ok[..., None]).reshape(p, 12),
        penalty=(penalty * new_slot_ok[..., None]).reshape(p, 12),
    )


def contact_geometry(contacts: Contacts, pos, quat, inv_mass, friction):
    """Pose-dependent contact geometry: the expensive half of
    computeConstraint (manifold.cpp:184-196), evaluated once per solver
    iteration and shared between the dual pass and the next primal pass.

    Returns basis (P, 4, 3rows, 3), world lever arms, raw separations/slips,
    per-pair friction/mass scalars, and validity masks.
    """
    p = contacts.p
    n = pos.shape[0]
    valid_pair = contacts.key != INACTIVE_KEY
    safe = jnp.where(valid_pair, contacts.key, 0)
    ia = safe // n
    ib = safe % n

    slot_ok = (jnp.arange(4)[None, :] < contacts.count[:, None]) & valid_pair[:, None]

    n_unit, t1, t2 = contact_basis(contacts.normal)
    rw_a = quat_rotate(quat[ia][:, None, :], contacts.r_a)
    rw_b = quat_rotate(quat[ib][:, None, :], contacts.r_b)
    delta = (pos[ia][:, None, :] + rw_a) - (pos[ib][:, None, :] + rw_b)

    inv_mass_sum = inv_mass[ia] + inv_mass[ib]
    mass_scale = jnp.where(inv_mass_sum > 1.0e-6, 1.0 / jnp.maximum(inv_mass_sum, 1.0e-6), 1.0)

    return {
        "basis": jnp.stack([n_unit, t1, t2], axis=-2),   # (P, 4, 3, 3)
        "rw_a": rw_a,
        "rw_b": rw_b,
        "sep": dot(delta, n_unit),
        "slip1": dot(delta, t1),
        "slip2": dot(delta, t2),
        "mass_scale": mass_scale,
        "mu": jnp.sqrt(friction[ia] * friction[ib]),
        "slot_ok": slot_ok,
        "row_ok": slot_ok[..., None] & jnp.ones((1, 1, 3), bool),
        "ia": ia,
        "ib": ib,
        "valid_pair": valid_pair,
    }


def contact_rows(geom, contacts: Contacts, lam, penalty, stick, alpha, params):
    """The cheap half of computeConstraint (manifold.cpp:193-245): biased C
    rows, friction-cone bounds, in-place lambda projection, stick update."""
    p = contacts.p
    lam = lam.reshape(p, 4, 3)

    bias = jnp.clip(1.0 - alpha, 0.0, 1.0)
    c_n = (geom["sep"] - params.normal_contact_margin) + bias * contacts.c0_n
    c_t1 = geom["slip1"] + bias * contacts.c0_t[..., 0]
    c_t2 = geom["slip2"] + bias * contacts.c0_t[..., 1]

    cap = params.normal_force_cap * geom["mass_scale"]   # (P,)

    # Trial normal magnitude -> dynamic friction cone (manifold.cpp:211-222).
    pen_n = penalty.reshape(p, 4, 3)[..., 0]
    lam_n = lam[..., 0]
    warm_mag = jnp.abs(jnp.minimum(lam_n, 0.0))
    trial = pen_n * c_n + lam_n
    trial_mag = jnp.abs(jnp.minimum(trial, 0.0))
    normal_mag = jnp.minimum(jnp.maximum(warm_mag, trial_mag), cap[:, None])

    mu = jnp.where(stick, geom["mu"][:, None], geom["mu"][:, None] * 0.9)
    limit = mu * normal_mag

    # Project warmstarted tangential lambda into the cone.
    lt1 = lam[..., 1]
    lt2 = lam[..., 2]
    tan_mag = jnp.sqrt(lt1 * lt1 + lt2 * lt2)
    scale = jnp.where((tan_mag > limit) & (tan_mag > 1.0e-8), limit / jnp.maximum(tan_mag, 1.0e-8), 1.0)
    lt1 = lt1 * scale
    lt2 = lt2 * scale
    lam = jnp.stack([lam_n, lt1, lt2], axis=-1)

    # Stick update (manifold.cpp:238-241) — uses biased slips.
    slip_sq = c_t1 * c_t1 + c_t2 * c_t2
    tan_sq = lt1 * lt1 + lt2 * lt2
    new_stick = (slip_sq <= params.stick_thresh**2) & (tan_sq <= limit * limit + 1.0e-8)
    new_stick = new_stick & geom["slot_ok"]

    c_rows = jnp.stack([c_n, c_t1, c_t2], axis=-1)
    fmin = jnp.stack([-cap[:, None] * jnp.ones_like(c_n), -limit, -limit], axis=-1)
    fmax = jnp.stack([jnp.zeros_like(c_n), limit, limit], axis=-1)

    return {
        "C": c_rows,
        "fmin": fmin,
        "fmax": fmax,
        "lam": lam,
        "stick": new_stick,
        "row_ok": geom["row_ok"],
    }


def contact_primal_force(row_state, penalty):
    """f = clamp(penalty * C + lambda, fmin, fmax)  (solver.cpp:379-381).

    Contact rows are always hard (stiffness = FLT_MAX) so lambdaWarm is the
    full dual.  Returns (P, 4, 3) masked forces.
    """
    pen = penalty.reshape(row_state["C"].shape)
    f = jnp.clip(
        pen * row_state["C"] + row_state["lam"],
        row_state["fmin"],
        row_state["fmax"],
    )
    return jnp.where(row_state["row_ok"], f, 0.0)


def contact_dual_update(row_state, geom, penalty, beta, params):
    """Dual ascent + penalty ramp for contact rows (solver.cpp:411-429).

    Must be called with rows/geometry evaluated at the *post-primal* poses.
    Returns (lam (P,12), penalty (P,12), stick (P,4)).
    """
    shape = row_state["C"].shape
    pen = penalty.reshape(shape)
    lam_new = jnp.clip(
        pen * row_state["C"] + row_state["lam"],
        row_state["fmin"],
        row_state["fmax"],
    )
    active = (lam_new > row_state["fmin"]) & (lam_new < row_state["fmax"])

    # rowPenaltyGain (solver.cpp:94-125): blend beta by linear vs angular
    # Jacobian weight across both bodies.  |J_lin| = 1 per body for contact
    # rows (basis is unit), so linear weight = 2.
    basis = geom["basis"]                            # (P, 4, 3, 3)
    ja_a = cross(geom["rw_a"][:, :, None, :], basis)
    ja_b = cross(geom["rw_b"][:, :, None, :], basis)
    lin_w = 2.0
    ang_w = jnp.sum(ja_a * ja_a, axis=-1) + jnp.sum(ja_b * ja_b, axis=-1)
    total = lin_w + ang_w
    gain = (beta * lin_w + beta * params.angular_beta_scale * ang_w) / jnp.maximum(total, 1.0e-8)

    pen_new = jnp.where(
        active,
        jnp.minimum(pen + gain * jnp.abs(row_state["C"]), params.manifold_penalty_cap),
        pen,
    )
    ok = row_state["row_ok"]
    lam_new = jnp.where(ok, lam_new, 0.0)
    pen_new = jnp.where(ok, pen_new, pen)
    p = shape[0]
    return lam_new.reshape(p, 12), pen_new.reshape(p, 12), row_state["stick"]
