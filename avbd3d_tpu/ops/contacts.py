"""Contact manifold constraints: warmstart transfer + AVBD row math.

TPU-native rebuild of ``source/manifold.cpp`` in component-major layout (see
cm.py): every per-pair quantity is a (P,)-shaped array with contact-slot /
component axes unrolled at trace time, so the whole contact pipeline fuses
into full-lane elementwise chains.

The reference stores contacts inside heap-allocated ``Manifold`` forces and
transfers lambda/penalty/anchor state by exact feature-id matching when a
manifold re-initializes (manifold.cpp:71-175).  Here the persistent state
lives in the fixed-capacity ``Contacts`` pair-slot cache; cross-step pair
identity is a sorted-key merge (``jnp.searchsorted``) and the 4x4 within-pair
feature matching is an unrolled masked first-match loop.

Row layout per pair: 12 rows = 4 contacts x (normal, tangent1, tangent2),
matching getRowCount() (manifold.cpp:66-69).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import cm
from ..state import Contacts, INACTIVE_KEY

_UP = (0.0, 1.0, 0.0)


def contact_basis_cm(normal):
    """Deterministic orthonormal basis from a contact normal (tuple form).

    Mirrors buildContactBasis (manifold.cpp:39-50)."""
    n = cm.normalize_or(normal, _UP)
    cond = jnp.abs(n[0]) >= jnp.abs(n[2])
    zero = jnp.zeros_like(n[0])
    t1 = (
        jnp.where(cond, -n[1], zero),
        jnp.where(cond, n[0], -n[2]),
        jnp.where(cond, zero, n[1]),
    )
    t1 = cm.normalize_or(t1, (1.0, 0.0, 0.0))
    t2 = cm.normalize_or(cm.cross(n, t1), (0.0, 0.0, 1.0))
    return n, t1, t2


def _slot_vec(arr_43p, s):
    """(4, 3, P)[slot] -> component tuple."""
    return (arr_43p[s, 0], arr_43p[s, 1], arr_43p[s, 2])


def match_and_init(old: Contacts, keys, geom, pair_body, params) -> Contacts:
    """Phase-2 manifold initialize + warmstart (manifold.cpp:71-175) plus the
    solver's warmstart decay loop (solver.cpp:281-293), component-major.

    ``geom`` is the narrowphase_cm output for the new ``keys``; ``pair_body``
    carries the pair-gathered body poses {'pa','qa','pb','qb'} at the
    *pre-prediction* step state (initialize runs before body prediction).
    """
    p = keys.shape[0]
    valid_pair = keys != INACTIVE_KEY
    pa, qa = pair_body["pa"], pair_body["qa"]
    pb, qb = pair_body["pb"], pair_body["qb"]

    # ---- cross-step pair matching (sorted-key merge) ----
    loc = jnp.clip(jnp.searchsorted(old.key, keys), 0, old.key.shape[0] - 1)
    pair_matched = (old.key[loc] == keys) & valid_pair

    o_feature = old.feature[:, loc]                    # (4, P)
    o_count = jnp.where(pair_matched, old.count[loc], 0)
    o_slot_ok = [
        (jnp.int32(s) < o_count) & (o_feature[s] >= 0) for s in range(4)
    ]
    o_stick = old.stick[:, loc]
    o_normal = (old.normal[0, loc], old.normal[1, loc], old.normal[2, loc])
    o_r_a = old.r_a[:, :, loc]                         # (4, 3, P)
    o_r_b = old.r_b[:, :, loc]
    o_lam = old.lam[:, loc]                            # (12, P)
    o_pen = old.penalty[:, loc]

    new_n_unit = cm.normalize_or(geom["normal"], _UP)
    old_n_unit = cm.normalize_or(o_normal, new_n_unit)
    normal_dot = cm.dot(new_n_unit, old_n_unit)        # (P,) per pair

    # ---- greedy first-unused exact-feature match, 4 new x 4 old ----
    # (manifold.cpp:109-119)
    used = [jnp.zeros(p, bool) for _ in range(4)]
    match_j = []
    match_ok = []
    for i in range(4):
        best_j = jnp.zeros(p, jnp.int32)
        found = jnp.zeros(p, bool)
        for j in range(4):
            elig = (
                (o_feature[j] == geom["feature"][i])
                & o_slot_ok[j]
                & ~used[j]
                & geom["slot_ok"][i]
                & ~found
            )
            best_j = jnp.where(elig, j, best_j)
            found = found | elig
            used[j] = used[j] | elig
        match_j.append(best_j)
        match_ok.append(found)

    def sel_old(arr_list, j_idx):
        """Select old-slot data ([4] list of (P,) or tuples) by j index."""
        out = arr_list[0]
        for j in range(1, 4):
            if isinstance(out, tuple):
                out = cm.where(j_idx == j, arr_list[j], out)
            else:
                out = jnp.where(j_idx == j, arr_list[j], out)
        return out

    # ---- per-new-slot warmstart transfer ----
    r_a_slots = []
    r_b_slots = []
    stick_slots = []
    lam_rows = []
    pen_rows = []
    c0n_slots = []
    c0t1_slots = []
    c0t2_slots = []

    n_unit, t1, t2 = contact_basis_cm(geom["normal"])

    ws_drift2 = params.warmstart_max_drift**2
    st_drift2 = params.stick_anchor_max_drift**2
    decay = params.alpha * params.gamma

    old_r_a_list = [_slot_vec(o_r_a, s) for s in range(4)]
    old_r_b_list = [_slot_vec(o_r_b, s) for s in range(4)]
    old_stick_list = [o_stick[s] for s in range(4)]
    old_lam_list = [(o_lam[s * 3], o_lam[s * 3 + 1], o_lam[s * 3 + 2]) for s in range(4)]
    old_pen_list = [(o_pen[s * 3], o_pen[s * 3 + 1], o_pen[s * 3 + 2]) for s in range(4)]
    # Old-slot world midpoints at current poses (manifold.cpp:128).
    old_mid_list = [
        cm.scale(
            cm.add(
                cm.add(pa, cm.q_rotate(qa, old_r_a_list[s])),
                cm.add(pb, cm.q_rotate(qb, old_r_b_list[s])),
            ),
            0.5,
        )
        for s in range(4)
    ]

    for i in range(4):
        j_idx = match_j[i]
        matched = match_ok[i]

        new_r_a = (geom_r_a := cm.q_rotate_inv(qa, cm.sub(geom["x_a"][i], pa)))
        new_r_b = cm.q_rotate_inv(qb, cm.sub(geom["x_b"][i], pb))
        new_mid = cm.scale(cm.add(geom["x_a"][i], geom["x_b"][i]), 0.5)

        m_old_mid = sel_old(old_mid_list, j_idx)
        m_old_stick = sel_old(old_stick_list, j_idx)
        m_old_r_a = sel_old(old_r_a_list, j_idx)
        m_old_r_b = sel_old(old_r_b_list, j_idx)
        m_old_lam = sel_old(old_lam_list, j_idx)
        m_old_pen = sel_old(old_pen_list, j_idx)

        drift2 = cm.length_sq(cm.sub(new_mid, m_old_mid))
        warm = (
            matched
            & (normal_dot >= params.warmstart_normal_min_dot)
            & (drift2 <= ws_drift2)
        )
        lam_i = tuple(jnp.where(warm, l, 0.0) for l in m_old_lam)
        pen_i = tuple(
            jnp.where(
                warm,
                jnp.clip(pe, params.penalty_min, params.manifold_penalty_cap),
                params.penalty_min,
            )
            for pe in m_old_pen
        )
        reuse = (
            warm
            & m_old_stick
            & (normal_dot >= params.stick_normal_min_dot)
            & (drift2 <= st_drift2)
        )
        stick_i = m_old_stick & reuse
        r_a_i = cm.where(reuse, m_old_r_a, new_r_a)
        r_b_i = cm.where(reuse, m_old_r_b, new_r_b)

        # Warmstart decay (solver.cpp:281-293); contact rows are hard.
        if not params.post_stabilize:
            lam_i = tuple(l * decay for l in lam_i)
        pen_i = tuple(
            jnp.clip(pe * params.gamma, params.penalty_min, params.penalty_max)
            for pe in pen_i
        )
        ok = geom["slot_ok"][i]
        lam_i = tuple(jnp.where(ok, l, 0.0) for l in lam_i)
        pen_i = tuple(jnp.where(ok, pe, 0.0) for pe in pen_i)

        # Alpha-stabilization cache at pre-step poses (manifold.cpp:159-171).
        p_a_i = cm.add(pa, cm.q_rotate(qa, r_a_i))
        p_b_i = cm.add(pb, cm.q_rotate(qb, r_b_i))
        delta = cm.sub(p_a_i, p_b_i)
        c0n_slots.append(cm.dot(delta, n_unit) - params.normal_contact_margin)
        c0t1_slots.append(cm.dot(delta, t1))
        c0t2_slots.append(cm.dot(delta, t2))

        r_a_slots.append(r_a_i)
        r_b_slots.append(r_b_i)
        stick_slots.append(stick_i)
        lam_rows.extend(lam_i)
        pen_rows.extend(pen_i)

    return Contacts(
        key=keys,
        count=geom["count"],
        feature=jnp.stack(geom["feature"]),
        r_a=jnp.stack([jnp.stack(v) for v in r_a_slots]),
        r_b=jnp.stack([jnp.stack(v) for v in r_b_slots]),
        normal=jnp.stack(n_unit),
        stick=jnp.stack(stick_slots),
        c0_n=jnp.stack(c0n_slots),
        c0_t1=jnp.stack(c0t1_slots),
        c0_t2=jnp.stack(c0t2_slots),
        lam=jnp.stack(lam_rows),
        penalty=jnp.stack(pen_rows),
    )


def contact_pair_constants(contacts: Contacts, inv_mass, friction):
    """Pair-static scalars gathered once per step: friction coefficient
    sqrt(muA*muB) (manifold.cpp:73) and the normal force cap's mass scale
    (manifold.cpp:199-204)."""
    n = inv_mass.shape[0]
    valid = contacts.key != INACTIVE_KEY
    safe = jnp.where(valid, contacts.key, 0)
    ia = safe // n
    ib = safe % n
    inv_sum = inv_mass[ia] + inv_mass[ib]
    mass_scale = jnp.where(inv_sum > 1.0e-6, 1.0 / jnp.maximum(inv_sum, 1.0e-6), 1.0)
    return {
        "ia": ia,
        "ib": ib,
        "valid_pair": valid,
        "mu": jnp.sqrt(friction[ia] * friction[ib]),
        "mass_scale": mass_scale,
        "slot_ok": [
            (jnp.int32(s) < contacts.count) & valid for s in range(4)
        ],
    }


def contact_geometry(contacts: Contacts, consts, px, py, pz, qx, qy, qz, qw):
    """Pose-dependent contact geometry (the expensive half of
    computeConstraint, manifold.cpp:184-196): world lever arms and raw
    separation/slips per slot.  Body state arrives as (N,) component arrays;
    pair gathers happen here."""
    ia, ib = consts["ia"], consts["ib"]
    pa = (px[ia], py[ia], pz[ia])
    pb = (px[ib], py[ib], pz[ib])
    qa = (qx[ia], qy[ia], qz[ia], qw[ia])
    qb = (qx[ib], qy[ib], qz[ib], qw[ib])

    n_unit, t1, t2 = contact_basis_cm(
        (contacts.normal[0], contacts.normal[1], contacts.normal[2])
    )

    rw_a = []
    rw_b = []
    sep = []
    slip1 = []
    slip2 = []
    for s in range(4):
        ra = cm.q_rotate(qa, _slot_vec(contacts.r_a, s))
        rb = cm.q_rotate(qb, _slot_vec(contacts.r_b, s))
        delta = cm.sub(cm.add(pa, ra), cm.add(pb, rb))
        rw_a.append(ra)
        rw_b.append(rb)
        sep.append(cm.dot(delta, n_unit))
        slip1.append(cm.dot(delta, t1))
        slip2.append(cm.dot(delta, t2))

    return {
        "basis": (n_unit, t1, t2),
        "rw_a": rw_a,           # [4] of vec3 tuples
        "rw_b": rw_b,
        "sep": sep,             # [4] of (P,)
        "slip1": slip1,
        "slip2": slip2,
    }


def contact_rows(geom, contacts: Contacts, consts, lam, penalty, stick, alpha, params):
    """The cheap half of computeConstraint (manifold.cpp:193-245): biased C
    rows, friction-cone bounds, in-place lambda projection, stick update.

    lam/penalty are (12, P); stick is (4, P).  Returns row data as lists of
    (P,) arrays plus the projected lam."""
    bias = jnp.clip(1.0 - alpha, 0.0, 1.0)
    cap = params.normal_force_cap * consts["mass_scale"]

    c_rows = [None] * 12
    fmin = [None] * 12
    fmax = [None] * 12
    lam_out = [None] * 12
    stick_out = [None] * 4

    for s in range(4):
        c_n = (geom["sep"][s] - params.normal_contact_margin) + bias * contacts.c0_n[s]
        c_t1 = geom["slip1"][s] + bias * contacts.c0_t1[s]
        c_t2 = geom["slip2"][s] + bias * contacts.c0_t2[s]

        pen_n = penalty[s * 3]
        lam_n = lam[s * 3]
        warm_mag = jnp.abs(jnp.minimum(lam_n, 0.0))
        trial = pen_n * c_n + lam_n
        trial_mag = jnp.abs(jnp.minimum(trial, 0.0))
        normal_mag = jnp.minimum(jnp.maximum(warm_mag, trial_mag), cap)

        mu = jnp.where(stick[s], consts["mu"], consts["mu"] * 0.9)
        limit = mu * normal_mag

        lt1 = lam[s * 3 + 1]
        lt2 = lam[s * 3 + 2]
        tan_mag = jnp.sqrt(lt1 * lt1 + lt2 * lt2)
        scale = jnp.where(
            (tan_mag > limit) & (tan_mag > 1.0e-8),
            limit / jnp.maximum(tan_mag, 1.0e-8),
            1.0,
        )
        lt1 = lt1 * scale
        lt2 = lt2 * scale

        slip_sq = c_t1 * c_t1 + c_t2 * c_t2
        tan_sq = lt1 * lt1 + lt2 * lt2
        new_stick = (
            (slip_sq <= params.stick_thresh**2)
            & (tan_sq <= limit * limit + 1.0e-8)
            & consts["slot_ok"][s]
        )

        c_rows[s * 3] = c_n
        c_rows[s * 3 + 1] = c_t1
        c_rows[s * 3 + 2] = c_t2
        fmin[s * 3] = -cap
        fmax[s * 3] = jnp.zeros_like(cap)
        fmin[s * 3 + 1] = -limit
        fmax[s * 3 + 1] = limit
        fmin[s * 3 + 2] = -limit
        fmax[s * 3 + 2] = limit
        lam_out[s * 3] = lam_n
        lam_out[s * 3 + 1] = lt1
        lam_out[s * 3 + 2] = lt2
        stick_out[s] = new_stick

    row_ok = [consts["slot_ok"][r // 3] for r in range(12)]
    return {
        "C": c_rows,
        "fmin": fmin,
        "fmax": fmax,
        "lam": lam_out,         # [12] of (P,) — cone-projected
        "stick": stick_out,     # [4] of (P,)
        "row_ok": row_ok,
    }


def contact_primal_force(rows, penalty):
    """f = clamp(penalty * C + lambda, fmin, fmax)  (solver.cpp:379-381).
    Contact rows are always hard so lambdaWarm is the full dual.
    Returns [12] list of (P,) forces, masked."""
    out = []
    for r in range(12):
        f = jnp.clip(
            penalty[r] * rows["C"][r] + rows["lam"][r],
            rows["fmin"][r],
            rows["fmax"][r],
        )
        out.append(jnp.where(rows["row_ok"][r], f, 0.0))
    return out


def contact_dual_update(rows, geom, penalty, beta, params):
    """Dual ascent + penalty ramp for contact rows (solver.cpp:411-429),
    evaluated at the post-primal poses.  Returns (lam (12,P), pen (12,P),
    stick (4,P))."""
    n_unit, t1, t2 = geom["basis"]
    basis = (n_unit, t1, t2)
    lam_new = [None] * 12
    pen_new = [None] * 12

    for s in range(4):
        # rowPenaltyGain weights (solver.cpp:94-125): |J_lin|=1 per body.
        for k in range(3):
            r = s * 3 + k
            ja_a = cm.cross(geom["rw_a"][s], basis[k])
            ja_b = cm.cross(geom["rw_b"][s], basis[k])
            ang_w = cm.length_sq(ja_a) + cm.length_sq(ja_b)
            lin_w = 2.0
            gain = (beta * lin_w + beta * params.angular_beta_scale * ang_w) / (
                lin_w + ang_w + 1.0e-8
            )

            lam_r = jnp.clip(
                penalty[r] * rows["C"][r] + rows["lam"][r],
                rows["fmin"][r],
                rows["fmax"][r],
            )
            active = (lam_r > rows["fmin"][r]) & (lam_r < rows["fmax"][r])
            pe = jnp.where(
                active,
                jnp.minimum(penalty[r] + gain * jnp.abs(rows["C"][r]), params.manifold_penalty_cap),
                penalty[r],
            )
            ok = rows["row_ok"][r]
            lam_new[r] = jnp.where(ok, lam_r, 0.0)
            pen_new[r] = jnp.where(ok, pe, penalty[r])

    return jnp.stack(lam_new), jnp.stack(pen_new), jnp.stack(rows["stick"])


def contact_side_contributions(geom, f_rows, penalty, iiw_a, iiw_b):
    """Per-(pair, side) force and 6x6-LHS contributions, pair space.

    For each side (A: +1, B: -1) accumulate over the pair's 12 rows:
      F      = sum_r J_lin f_r              (3, sign applied)
      T      = sum_r J_ang f_r              (3, sign applied)
      M_ll   = sum_r pen_r b_r b_r^T        (6 upper, sign-free)
      M_la   = sum_r pen_r b_r (rw x b_r)^T (9, sign-free)
      M_aa   = sum_r pen_r (rw x b_r)(rw x b_r)^T  (6 upper, sign-free)
      gyro   = sum_r |J_ang x (Iinv_w J_ang)| |f_r| (3, solver.cpp:393-397)
    Because J_lin = sign*b and J_ang = sign*(rw x b), the quadratic terms
    drop the sign.  Within one contact slot all 3 rows share rw, so
    sum_r J_ang f_r = rw x (sum_r b_r f_r).

    Returns a (2P, 32) matrix: rows [0, P) = side A, [P, 2P) = side B;
    cols [Fx Fy Fz Tx Ty Tz | Mll(6) | Mla(9) | Maa(6) | gyro(3) | pad2].
    """
    n_unit, t1, t2 = geom["basis"]
    basis = (n_unit, t1, t2)
    p = n_unit[0].shape[0]

    cols = {"A": None, "B": None}
    for side, rw_list, iiw in (("A", geom["rw_a"], iiw_a), ("B", geom["rw_b"], iiw_b)):
        F = (0.0, 0.0, 0.0)
        T = (0.0, 0.0, 0.0)
        m_ll = [0.0] * 6
        m_la = [0.0] * 9
        m_aa = [0.0] * 6
        gyro = [0.0, 0.0, 0.0]
        for s in range(4):
            rw = rw_list[s]
            # Per-slot linear force vector sum_k b_k f_k.
            fs = (f_rows[s * 3], f_rows[s * 3 + 1], f_rows[s * 3 + 2])
            Fv = (
                basis[0][0] * fs[0] + basis[1][0] * fs[1] + basis[2][0] * fs[2],
                basis[0][1] * fs[0] + basis[1][1] * fs[1] + basis[2][1] * fs[2],
                basis[0][2] * fs[0] + basis[1][2] * fs[1] + basis[2][2] * fs[2],
            )
            F = cm.add(F, Fv) if s else Fv
            Tv = cm.cross(rw, Fv)
            T = cm.add(T, Tv) if s else Tv

            for k in range(3):
                b = basis[k]
                pe = penalty[s * 3 + k]
                c = cm.cross(rw, b)
                # upper-tri ll
                m_ll[0] += pe * b[0] * b[0]
                m_ll[1] += pe * b[0] * b[1]
                m_ll[2] += pe * b[0] * b[2]
                m_ll[3] += pe * b[1] * b[1]
                m_ll[4] += pe * b[1] * b[2]
                m_ll[5] += pe * b[2] * b[2]
                # full la (3x3, row-major: b_i * c_j)
                for i in range(3):
                    for j in range(3):
                        m_la[i * 3 + j] += pe * b[i] * c[j]
                # upper-tri aa
                m_aa[0] += pe * c[0] * c[0]
                m_aa[1] += pe * c[0] * c[1]
                m_aa[2] += pe * c[0] * c[2]
                m_aa[3] += pe * c[1] * c[1]
                m_aa[4] += pe * c[1] * c[2]
                m_aa[5] += pe * c[2] * c[2]
                # gyroscopic diag: |c x (Iinv c)| * |f|
                ic = (
                    iiw[0] * c[0] + iiw[1] * c[1] + iiw[2] * c[2],
                    iiw[1] * c[0] + iiw[3] * c[1] + iiw[4] * c[2],
                    iiw[2] * c[0] + iiw[4] * c[1] + iiw[5] * c[2],
                )
                g = cm.cross(c, ic)
                af = jnp.abs(f_rows[s * 3 + k])
                gyro[0] += jnp.abs(g[0]) * af
                gyro[1] += jnp.abs(g[1]) * af
                gyro[2] += jnp.abs(g[2]) * af

        sign = 1.0 if side == "A" else -1.0
        col = (
            [sign * x for x in F]
            + [sign * x for x in T]
            + m_ll
            + m_la
            + m_aa
            + gyro
            + [jnp.zeros(p), jnp.zeros(p)]
        )
        cols[side] = jnp.stack(col, axis=-1)    # (P, 32)

    return jnp.concatenate([cols["A"], cols["B"]], axis=0)   # (2P, 32)
