"""Component-major SAT narrowphase: the TPU-hot-layout twin of narrowphase.py.

Same algorithm as ops/narrowphase.py (see its docstring for the mapping to
reference collision.cpp), but every quantity is a (P,)-shaped component array
with the pair axis in the minor (lane) dimension and all small/static loops
(15 SAT axes, 4 incident corners, 16 edge crossings, 4 rect corners, 24
candidate slots, 4 contact picks) unrolled in Python.  This turns the whole
narrowphase into one long fusable elementwise chain over full 128-lane tiles
instead of hundreds of (P, 3)/(P, 4, 3)-shaped padded kernels.

narrowphase.py remains the readable reference; tests assert both agree.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import cm

SAT_AXIS_EPSILON = 1.0e-6
PLANE_EPSILON = 1.0e-5
CONTACT_MERGE_DIST_SQ = 1.0e-6
AXIS_EDGE = 2

_NEG = -3.0e38


def _select3(idx, items):
    """items[idx] for idx in {0,1,2}: unrolled component-wise select."""
    def sel(c0, c1, c2):
        return jnp.where(idx == 0, c0, jnp.where(idx == 1, c1, c2))
    if isinstance(items[0], tuple):
        return tuple(sel(items[0][k], items[1][k], items[2][k]) for k in range(len(items[0])))
    return sel(*items)


def _axis_max(seps, valids):
    """First-win strict-greater max over a static list: returns (sep, idx)."""
    best_sep = jnp.where(valids[0], seps[0], _NEG)
    best_idx = jnp.zeros_like(seps[0], dtype=jnp.int32)
    for k in range(1, len(seps)):
        s = jnp.where(valids[k], seps[k], _NEG)
        take = s > best_sep
        best_sep = jnp.where(take, s, best_sep)
        best_idx = jnp.where(take, k, best_idx)
    return best_sep, best_idx


def collide_pairs_cm(body_a, body_b, margin):
    """body_a/body_b: dicts with component tuples 'pos' (3), 'quat' (4),
    'half' (3), all (P,)-shaped.  Returns contact data, component-major.
    """
    pa, qa, ha = body_a["pos"], body_a["quat"], body_a["half"]
    pb, qb, hb = body_b["pos"], body_b["quat"], body_b["half"]

    axes_a = cm.q_axes(qa)      # 3 x vec3 tuples
    axes_b = cm.q_axes(qb)
    delta = cm.sub(pb, pa)

    # ---- 15 SAT axes ----
    face_seps, face_valid = [], []
    edge_seps, edge_valid = [], []
    edge_normals = []
    face_normals = []

    def test_axis(axis, out_seps, out_valid, out_normals):
        lsq = cm.length_sq(axis)
        degen = lsq < SAT_AXIS_EPSILON
        inv = 1.0 / jnp.sqrt(jnp.where(degen, 1.0, lsq))
        n = cm.scale(axis, inv)
        flip = cm.dot(n, delta) < 0.0
        n = tuple(jnp.where(flip, -x, x) for x in n)
        dist = jnp.abs(cm.dot(n, delta))
        r_a = (
            ha[0] * jnp.abs(cm.dot(n, axes_a[0]))
            + ha[1] * jnp.abs(cm.dot(n, axes_a[1]))
            + ha[2] * jnp.abs(cm.dot(n, axes_a[2]))
        )
        r_b = (
            hb[0] * jnp.abs(cm.dot(n, axes_b[0]))
            + hb[1] * jnp.abs(cm.dot(n, axes_b[1]))
            + hb[2] * jnp.abs(cm.dot(n, axes_b[2]))
        )
        out_seps.append(dist - (r_a + r_b))
        out_valid.append(~degen)
        out_normals.append(n)

    for k in range(3):
        test_axis(axes_a[k], face_seps, face_valid, face_normals)
    for k in range(3):
        test_axis(axes_b[k], face_seps, face_valid, face_normals)
    for i in range(3):
        for j in range(3):
            test_axis(cm.cross(axes_a[i], axes_b[j]), edge_seps, edge_valid, edge_normals)

    separated = jnp.zeros_like(face_seps[0], dtype=bool)
    for s, v in zip(face_seps + edge_seps, face_valid + edge_valid):
        separated |= v & (s > margin)

    best_face_sep, best_face = _axis_max(face_seps, face_valid)
    best_edge_sep, best_edge = _axis_max(edge_seps, edge_valid)
    edge_any = jnp.zeros_like(separated)
    for v in edge_valid:
        edge_any |= v
    # Edge preference rule (collision.cpp:459-468) with a depth gate: with
    # negative separations the reference formula *favors* the edge axis, so a
    # deeply-overlapping box pair would drop from a 4-point face manifold to
    # a single edge contact and lose support.  The C++ rarely reaches deep
    # overlap (sequential Gauss-Seidel), but the Jacobi solver transiently
    # does during impact cascades; restrict the edge path to shallow contacts
    # where the anti-flicker rule is meant to apply.
    use_edge = (
        edge_any
        & (0.95 * best_edge_sep > best_face_sep + 0.01)
        & (best_edge_sep > -0.05)
    )

    # ---- face manifold ----
    ref_is_a = best_face < 3
    ref_axis = jnp.where(ref_is_a, best_face, best_face - 3)
    # normal of the winning face axis (oriented A->B), selected unrolled.
    normal_ab = face_normals[0]
    for k in range(1, 6):
        normal_ab = cm.where(best_face == k, face_normals[k], normal_ab)

    def pick_box(field_a, field_b):
        return cm.where(ref_is_a, field_a, field_b)

    ref_ax0 = pick_box(axes_a[0], axes_b[0])
    ref_ax1 = pick_box(axes_a[1], axes_b[1])
    ref_ax2 = pick_box(axes_a[2], axes_b[2])
    inc_ax0 = pick_box(axes_b[0], axes_a[0])
    inc_ax1 = pick_box(axes_b[1], axes_a[1])
    inc_ax2 = pick_box(axes_b[2], axes_a[2])
    ref_center = pick_box(pa, pb)
    inc_center = pick_box(pb, pa)
    ref_half = tuple(jnp.where(ref_is_a, x, y) for x, y in zip(ha, hb))
    inc_half = tuple(jnp.where(ref_is_a, x, y) for x, y in zip(hb, ha))

    ref_outward = cm.where(ref_is_a, normal_ab, cm.neg(normal_ab))
    ref_axes = (ref_ax0, ref_ax1, ref_ax2)
    inc_axes = (inc_ax0, inc_ax1, inc_ax2)
    ref_axis_vec = _select3(ref_axis, ref_axes)
    sign_ref = jnp.where(cm.dot(ref_outward, ref_axis_vec) >= 0.0, 1.0, -1.0)
    n_ref = cm.scale(ref_axis_vec, sign_ref)
    ref_h = _select3(ref_axis, ref_half)
    face_center = cm.add(ref_center, cm.scale(n_ref, ref_h))

    u_idx = jnp.where(ref_axis == 0, 1, 0)
    v_idx = jnp.where(ref_axis == 2, 1, 2)
    u_ax = _select3(u_idx, ref_axes)
    v_ax = _select3(v_idx, ref_axes)
    eu = _select3(u_idx, ref_half)
    ev = _select3(v_idx, ref_half)

    # incident face: most anti-parallel to n_ref (first-win max of |dot|)
    inc_dots = [jnp.abs(cm.dot(inc_axes[k], n_ref)) for k in range(3)]
    _, inc_axis = _axis_max(inc_dots, [jnp.ones_like(separated)] * 3)
    inc_axis_vec = _select3(inc_axis, inc_axes)
    sign_inc = jnp.where(cm.dot(inc_axis_vec, n_ref) > 0.0, -1.0, 1.0)
    n_inc = cm.scale(inc_axis_vec, sign_inc)
    inc_h = _select3(inc_axis, inc_half)
    inc_face_center = cm.add(inc_center, cm.scale(n_inc, inc_h))

    iu_idx = jnp.where(inc_axis == 0, 1, 0)
    iv_idx = jnp.where(inc_axis == 2, 1, 2)
    iu_ax = _select3(iu_idx, inc_axes)
    iv_ax = _select3(iv_idx, inc_axes)
    ieu = _select3(iu_idx, inc_half)
    iev = _select3(iv_idx, inc_half)

    # Incident corners projected into the (u, v, h) reference-face frame.
    su = (1.0, -1.0, -1.0, 1.0)
    sv = (1.0, 1.0, -1.0, -1.0)
    cu, cv = [], []
    for m in range(4):
        corner = cm.add(
            inc_face_center,
            cm.add(cm.scale(iu_ax, su[m] * ieu), cm.scale(iv_ax, sv[m] * iev)),
        )
        rel = cm.sub(corner, face_center)
        cu.append(cm.dot(rel, u_ax))
        cv.append(cm.dot(rel, v_ax))

    # Affine height h(u, v) on the incident plane.
    d_nn = cm.dot(n_inc, n_ref)
    d_nn = jnp.where(
        jnp.abs(d_nn) < SAT_AXIS_EPSILON,
        jnp.where(d_nn < 0, -SAT_AXIS_EPSILON, SAT_AXIS_EPSILON),
        d_nn,
    )
    h0 = cm.dot(n_inc, cm.sub(inc_face_center, face_center)) / d_nn
    hu = -cm.dot(n_inc, u_ax) / d_nn
    hv = -cm.dot(n_inc, v_ax) / d_nn

    # ---- candidate set: 4 corners + 16 crossings + 4 rect corners ----
    cand_u, cand_v, cand_ok = [], [], []
    for m in range(4):
        ok = (jnp.abs(cu[m]) <= eu + PLANE_EPSILON) & (jnp.abs(cv[m]) <= ev + PLANE_EPSILON)
        cand_u.append(cu[m])
        cand_v.append(cv[m])
        cand_ok.append(ok)

    for m in range(4):
        m2 = (m + 1) % 4
        du = cu[m2] - cu[m]
        dv = cv[m2] - cv[m]
        for side_u, side_sign in ((True, 1.0), (True, -1.0), (False, 1.0), (False, -1.0)):
            if side_u:
                bound = eu * side_sign
                dcoord, ccoord = du, cu[m]
                oc, od, oext = cv[m], dv, ev
            else:
                bound = ev * side_sign
                dcoord, ccoord = dv, cv[m]
                oc, od, oext = cu[m], du, eu
            denom_ok = jnp.abs(dcoord) > SAT_AXIS_EPSILON
            t = (bound - ccoord) / jnp.where(denom_ok, dcoord, 1.0)
            hit = oc + t * od
            ok = (
                denom_ok
                & (t >= -PLANE_EPSILON)
                & (t <= 1.0 + PLANE_EPSILON)
                & (jnp.abs(hit) <= oext + PLANE_EPSILON)
            )
            if side_u:
                cand_u.append(bound + jnp.zeros_like(hit))
                cand_v.append(hit)
            else:
                cand_u.append(hit)
                cand_v.append(bound + jnp.zeros_like(hit))
            cand_ok.append(ok)

    # rect corners inside the incident quad projection
    area2 = (
        (cu[1] - cu[0]) * (cv[2] - cv[0]) - (cv[1] - cv[0]) * (cu[2] - cu[0])
        + (cu[2] - cu[0]) * (cv[3] - cv[0]) - (cv[2] - cv[0]) * (cu[3] - cu[0])
    )
    wind = jnp.where(area2 >= 0.0, 1.0, -1.0)
    rsu = (1.0, -1.0, -1.0, 1.0)
    rsv = (1.0, 1.0, -1.0, -1.0)
    for m in range(4):
        ru = rsu[m] * eu
        rv = rsv[m] * ev
        inside = jnp.ones_like(separated)
        for e in range(4):
            e2 = (e + 1) % 4
            z = (cu[e2] - cu[e]) * (rv - cv[e]) - (cv[e2] - cv[e]) * (ru - cu[e])
            inside &= (z * wind) >= -PLANE_EPSILON
        cand_u.append(ru)
        cand_v.append(rv)
        cand_ok.append(inside)

    cand_h = [h0 + hu * u + hv * v for u, v in zip(cand_u, cand_v)]
    cand_ok = [ok & (h <= margin) for ok, h in zip(cand_ok, cand_h)]

    # ---- reduce to <= 4 picks: deepest, farthest, +/- max area ----
    n_cand = len(cand_u)   # 24

    def pick(valid_list, score_list):
        best_s = jnp.where(valid_list[0], score_list[0], _NEG)
        best_i = jnp.zeros_like(best_s, dtype=jnp.int32)
        for k in range(1, n_cand):
            s = jnp.where(valid_list[k], score_list[k], _NEG)
            take = s > best_s
            best_s = jnp.where(take, s, best_s)
            best_i = jnp.where(take, k, best_i)
        found = best_s > _NEG * 0.5
        return best_i, found

    def gather_cand(lists, idx):
        out = lists[0]
        for k in range(1, n_cand):
            out = jnp.where(idx == k, lists[k], out)
        return out

    def drop_near(valid_list, pu, pv):
        return [
            v & (((u - pu) ** 2 + (v_ - pv) ** 2) >= CONTACT_MERGE_DIST_SQ)
            for v, u, v_ in zip(valid_list, cand_u, cand_v)
        ]

    valid = cand_ok
    i0, f0 = pick(valid, [-h for h in cand_h])
    p0u = gather_cand(cand_u, i0)
    p0v = gather_cand(cand_v, i0)
    valid = drop_near(valid, p0u, p0v)

    d2 = [(u - p0u) ** 2 + (v - p0v) ** 2 for u, v in zip(cand_u, cand_v)]
    i1, f1 = pick(valid, d2)
    p1u = gather_cand(cand_u, i1)
    p1v = gather_cand(cand_v, i1)
    valid = drop_near(valid, p1u, p1v)

    a01 = [
        (p1u - p0u) * (v - p0v) - (p1v - p0v) * (u - p0u)
        for u, v in zip(cand_u, cand_v)
    ]
    i2, f2 = pick(valid, a01)
    p2u = gather_cand(cand_u, i2)
    p2v = gather_cand(cand_v, i2)
    valid = drop_near(valid, p2u, p2v)

    i3, f3 = pick(valid, [-a for a in a01])
    p3u = gather_cand(cand_u, i3)
    p3v = gather_cand(cand_v, i3)

    picks_u = [p0u, p1u, p2u, p3u]
    picks_v = [p0v, p1v, p2v, p3v]
    picks_ok = [f0, f0 & f1, f0 & f1 & f2, f0 & f1 & f2 & f3]
    picks_h = [gather_cand(cand_h, i) for i in (i0, i1, i2, i3)]

    # ---- per-slot outputs ----
    eu_safe = jnp.where(eu > SAT_AXIS_EPSILON, eu, 1.0)
    ev_safe = jnp.where(ev > SAT_AXIS_EPSILON, ev, 1.0)
    face_type = jnp.where(ref_is_a, 0, 1).astype(jnp.int32)
    prefix = (face_type << 24) | (ref_axis.astype(jnp.int32) << 16) | (inc_axis.astype(jnp.int32) << 8)

    # ---- edge contact ----
    e_i = best_edge // 3
    e_j = best_edge % 3
    edge_n = edge_normals[0]
    for k in range(1, 9):
        edge_n = cm.where(best_edge == k, edge_normals[k], edge_n)

    def support_edge(axes, half, axis_index, direction):
        a1 = _select3((axis_index + 1) % 3, axes)
        a2 = _select3((axis_index + 2) % 3, axes)
        h1 = _select3((axis_index + 1) % 3, half)
        h2 = _select3((axis_index + 2) % 3, half)
        hx = _select3(axis_index, half)
        ax = _select3(axis_index, axes)
        s1 = jnp.where(cm.dot(direction, a1) >= 0.0, 1.0, -1.0)
        s2 = jnp.where(cm.dot(direction, a2) >= 0.0, 1.0, -1.0)
        ec = cm.add(cm.scale(a1, h1 * s1), cm.scale(a2, h2 * s2))
        return ec, cm.scale(ax, hx)

    ec_a, eh_a = support_edge(axes_a, ha, e_i, edge_n)
    ec_b, eh_b = support_edge(axes_b, hb, e_j, cm.neg(edge_n))
    p0 = cm.sub(cm.add(pa, ec_a), eh_a)
    p1 = cm.add(cm.add(pa, ec_a), eh_a)
    q0 = cm.sub(cm.add(pb, ec_b), eh_b)
    q1 = cm.add(cm.add(pb, ec_b), eh_b)

    d1 = cm.sub(p1, p0)
    d2_ = cm.sub(q1, q0)
    r = cm.sub(p0, q0)
    a = cm.dot(d1, d1)
    e = cm.dot(d2_, d2_)
    f = cm.dot(d2_, r)
    c = cm.dot(d1, r)
    b_ = cm.dot(d1, d2_)
    denom = a * e - b_ * b_
    a_safe = jnp.where(a > SAT_AXIS_EPSILON, a, 1.0)
    e_safe = jnp.where(e > SAT_AXIS_EPSILON, e, 1.0)
    s = jnp.where(
        jnp.abs(denom) > SAT_AXIS_EPSILON,
        jnp.clip((b_ * f - c * e) / jnp.where(jnp.abs(denom) > SAT_AXIS_EPSILON, denom, 1.0), 0.0, 1.0),
        0.0,
    )
    t = (b_ * s + f) / e_safe
    s = jnp.where(t < 0.0, jnp.clip(-c / a_safe, 0.0, 1.0),
                  jnp.where(t > 1.0, jnp.clip((b_ - c) / a_safe, 0.0, 1.0), s))
    t = jnp.clip(t, 0.0, 1.0)
    edge_x_a = cm.add(p0, cm.scale(d1, s))
    edge_x_b = cm.add(q0, cm.scale(d2_, t))
    edge_feature = (AXIS_EDGE << 24) | (e_i.astype(jnp.int32) << 8) | e_j.astype(jnp.int32)

    # ---- merge face/edge per slot ----
    normal_ba = cm.where(use_edge, cm.neg(edge_n), cm.neg(normal_ab))
    out = {
        "normal": normal_ba,
        "x_a": [],
        "x_b": [],
        "feature": [],
        "slot_ok": [],
    }
    for slot in range(4):
        fu = picks_u[slot]
        fv = picks_v[slot]
        fh = picks_h[slot]
        p_ref = cm.add(face_center, cm.add(cm.scale(u_ax, fu), cm.scale(v_ax, fv)))
        p_inc = cm.add(p_ref, cm.scale(n_ref, fh))
        face_x_a = cm.where(ref_is_a, p_ref, p_inc)
        face_x_b = cm.where(ref_is_a, p_inc, p_ref)
        q_u = jnp.clip(jnp.floor((fu / eu_safe + 1.0) * 7.5), 0, 15).astype(jnp.int32)
        q_v = jnp.clip(jnp.floor((fv / ev_safe + 1.0) * 7.5), 0, 15).astype(jnp.int32)
        face_feat = prefix | (q_u << 4) | q_v

        if slot == 0:
            x_a = cm.where(use_edge, edge_x_a, face_x_a)
            x_b = cm.where(use_edge, edge_x_b, face_x_b)
            feat = jnp.where(use_edge, edge_feature, face_feat)
            ok = use_edge | picks_ok[slot]
        else:
            x_a = face_x_a
            x_b = face_x_b
            feat = face_feat
            ok = picks_ok[slot] & ~use_edge
        ok = ok & ~separated
        out["x_a"].append(x_a)
        out["x_b"].append(x_b)
        out["feature"].append(jnp.where(ok, feat, -1))
        out["slot_ok"].append(ok)

    count = sum(ok.astype(jnp.int32) for ok in out["slot_ok"])
    out["count"] = count
    return out
