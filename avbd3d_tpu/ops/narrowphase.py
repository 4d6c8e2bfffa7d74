"""Branch-free OBB-vs-OBB narrowphase (SAT + contact manifold generation).

TPU-native rebuild of ``source/collision.cpp`` (reference lines cited below).
The reference walks 15 SAT axes with early-outs, then runs Sutherland-Hodgman
clipping with a dynamic vertex count (collision.cpp:136-174, 313-394).  Both
are branch-heavy and allocate per call — hostile to vmap/XLA.

Here the same geometry is computed as fixed-shape masked math:

- All 15 axis tests evaluated at once; separation and first-max selection via
  masked argmax (matches the strict-``>`` update order of
  ``testAxis``/``collide``, collision.cpp:208-247, 434-453).
- The clipped face-overlap polygon is never built incrementally.  Its vertex
  set has a closed form: (a) incident-face corners inside the reference face
  rectangle, (b) incident-edge x rectangle-side crossings, (c) rectangle
  corners inside the incident quad.  That is at most 4 + 16 + 4 = 24 candidate
  points, each with a validity mask — computed in one shot.
- Contact reduction: instead of "first 4 in clip order" (collision.cpp:366),
  a deterministic deepest-then-max-spread selection over the candidate set
  (same ``<= 4`` contacts, midpoint-dedup semantics of collision.cpp:176-206).
- Feature ids reproduce the exact bit layout of collision.cpp:362-364,
  381-388, 412 (type<<24 | refAxis<<16 | incAxis<<8 | qU<<4 | qV, and
  EDGE<<24 | axisA<<8 | axisB) so warmstart matching behaves identically.

Everything is vmapped over the candidate-pair axis; inactive pairs simply
produce zero contacts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..maths import quat_rotate_inv, quat_to_mat3

# collision.cpp:18-23
SAT_AXIS_EPSILON = 1.0e-6
PLANE_EPSILON = 1.0e-5
CONTACT_MERGE_DIST_SQ = 1.0e-6
AXIS_FACE_A = 0
AXIS_FACE_B = 1
AXIS_EDGE = 2

_NEG = -3.0e38


def _axes(q):
    """Box axes as rows: axes[k] = world direction of local axis k."""
    return jnp.swapaxes(quat_to_mat3(q), -1, -2)


def _face_uv(axes, half, axis_index):
    """Tangent axes/extents of face ``axis_index`` (collision.cpp:73-91).

    Returns u, v, eu, ev selected branch-free from the static table
    axis 0 -> (1, 2), axis 1 -> (0, 2), axis 2 -> (0, 1).
    """
    u_idx = jnp.asarray([1, 0, 0], jnp.int32)[axis_index]
    v_idx = jnp.asarray([2, 2, 1], jnp.int32)[axis_index]
    return axes[u_idx], axes[v_idx], half[u_idx], half[v_idx]


def _cross2(ax, ay, bx, by):
    return ax * by - ay * bx


def _collide_one(pos_a, quat_a, half_a, pos_b, quat_b, half_b, margin):
    """Single-pair OBB collision.  Returns (count, feature, xA, xB, normalBA).

    xA/xB are world-space contact points on A and B; normalBA points from B
    toward A (the reference convention, collision.cpp:198, 390, 413).
    """
    axes_a = _axes(quat_a)   # (3, 3), row k = axis k
    axes_b = _axes(quat_b)
    delta = pos_b - pos_a

    # --- 15 SAT axes (collision.cpp:434-453) -----------------------------
    # 0..2: faces of A, 3..5: faces of B, 6..14: edge crosses (i-major).
    edge_axes = jnp.cross(axes_a[:, None, :], axes_b[None, :, :]).reshape(9, 3)
    axes15 = jnp.concatenate([axes_a, axes_b, edge_axes], axis=0)

    len_sq = jnp.sum(axes15 * axes15, axis=-1)
    degenerate = len_sq < SAT_AXIS_EPSILON
    n = axes15 / jnp.sqrt(jnp.where(degenerate, 1.0, len_sq))[:, None]
    # Orient toward B (testAxis, collision.cpp:216-218).
    n = jnp.where((n @ delta < 0.0)[:, None], -n, n)
    distance = jnp.abs(n @ delta)
    r_a = jnp.abs(n @ axes_a.T) @ half_a
    r_b = jnp.abs(n @ axes_b.T) @ half_b
    sep = distance - (r_a + r_b)

    # Any valid axis separating beyond the persistence margin kills the pair
    # (collision.cpp:231-234).
    separated = jnp.any(jnp.where(degenerate, False, sep > margin))

    face_sep = jnp.where(degenerate[:6], _NEG, sep[:6])
    best_face = jnp.argmax(face_sep)
    best_face_sep = face_sep[best_face]

    edge_sep = jnp.where(degenerate[6:], _NEG, sep[6:])
    best_edge = jnp.argmax(edge_sep)
    best_edge_sep = edge_sep[best_edge]
    edge_valid = jnp.any(~degenerate[6:])

    # Edge preferred only when meaningfully better (collision.cpp:459-468);
    # depth-gated to shallow contacts (see narrowphase_cm for rationale).
    use_edge = (
        edge_valid
        & (0.95 * best_edge_sep > best_face_sep + 0.01)
        & (best_edge_sep > -0.05)
    )

    # --- Face manifold (collision.cpp:313-394) ---------------------------
    ref_is_a = best_face < 3
    ref_axis = jnp.where(ref_is_a, best_face, best_face - 3)
    normal_ab = n[best_face]

    ref_axes = jnp.where(ref_is_a, axes_a, axes_b)
    ref_half = jnp.where(ref_is_a, half_a, half_b)
    ref_center = jnp.where(ref_is_a, pos_a, pos_b)
    inc_axes = jnp.where(ref_is_a, axes_b, axes_a)
    inc_half = jnp.where(ref_is_a, half_b, half_a)
    inc_center = jnp.where(ref_is_a, pos_b, pos_a)

    ref_outward = jnp.where(ref_is_a, normal_ab, -normal_ab)
    sign_ref = jnp.where(jnp.dot(ref_outward, ref_axes[ref_axis]) >= 0.0, 1.0, -1.0)
    n_ref = ref_axes[ref_axis] * sign_ref
    face_center = ref_center + n_ref * ref_half[ref_axis]
    u_ax, v_ax, eu, ev = _face_uv(ref_axes, ref_half, ref_axis)

    # Incident face: the face of the other box most anti-parallel to n_ref
    # (collision.cpp:102-133).
    inc_axis = jnp.argmax(jnp.abs(inc_axes @ n_ref))
    sign_inc = jnp.where(jnp.dot(inc_axes[inc_axis], n_ref) > 0.0, -1.0, 1.0)
    n_inc = inc_axes[inc_axis] * sign_inc
    inc_face_center = inc_center + n_inc * inc_half[inc_axis]
    iu_ax, iv_ax, ieu, iev = _face_uv(inc_axes, inc_half, inc_axis)

    # Incident corners in the reference face frame.  Order matches
    # buildIncidentFace: (+,+), (-,+), (-,-), (+,-)  (collision.cpp:130-133).
    su = jnp.asarray([1.0, -1.0, -1.0, 1.0])
    sv = jnp.asarray([1.0, 1.0, -1.0, -1.0])
    corners = (
        inc_face_center[None, :]
        + su[:, None] * (iu_ax * ieu)[None, :]
        + sv[:, None] * (iv_ax * iev)[None, :]
    )  # (4, 3)
    rel = corners - face_center[None, :]
    cu = rel @ u_ax    # (4,)
    cv = rel @ v_ax

    # Height above the reference face is affine in (u, v) on the incident
    # plane: h(u, v) = h0 + hu*u + hv*v.  This replaces per-point projection
    # (collision.cpp:368, 374) with one closed form usable for every
    # candidate, including rectangle corners.
    d_nn = jnp.dot(n_inc, n_ref)
    d_nn = jnp.where(jnp.abs(d_nn) < SAT_AXIS_EPSILON,
                     jnp.where(d_nn < 0, -SAT_AXIS_EPSILON, SAT_AXIS_EPSILON),
                     d_nn)
    h0 = jnp.dot(n_inc, inc_face_center - face_center) / d_nn
    hu = -jnp.dot(n_inc, u_ax) / d_nn
    hv = -jnp.dot(n_inc, v_ax) / d_nn

    # ---- Candidate set for the clipped polygon (24 masked slots) ----
    cand_u = []
    cand_v = []
    cand_ok = []

    # (a) incident corners inside the rectangle
    in_rect = (jnp.abs(cu) <= eu + PLANE_EPSILON) & (jnp.abs(cv) <= ev + PLANE_EPSILON)
    cand_u.append(cu)
    cand_v.append(cv)
    cand_ok.append(in_rect)

    # (b) incident-edge x rectangle-side crossings (16 combos)
    nu = jnp.roll(cu, -1)
    nv = jnp.roll(cv, -1)
    du = nu - cu
    dv = nv - cv
    for side_u, side_sign in ((True, 1.0), (True, -1.0), (False, 1.0), (False, -1.0)):
        if side_u:
            bound, dcoord, ccoord = eu * side_sign, du, cu
            other_c, other_d, other_ext = cv, dv, ev
        else:
            bound, dcoord, ccoord = ev * side_sign, dv, cv
            other_c, other_d, other_ext = cu, du, eu
        denom_ok = jnp.abs(dcoord) > SAT_AXIS_EPSILON
        t = (bound - ccoord) / jnp.where(denom_ok, dcoord, 1.0)
        hit_other = other_c + t * other_d
        ok = (
            denom_ok
            & (t >= -PLANE_EPSILON)
            & (t <= 1.0 + PLANE_EPSILON)
            & (jnp.abs(hit_other) <= other_ext + PLANE_EPSILON)
        )
        if side_u:
            cand_u.append(jnp.full((4,), bound))
            cand_v.append(hit_other)
        else:
            cand_u.append(hit_other)
            cand_v.append(jnp.full((4,), bound))
        cand_ok.append(ok)

    # (c) rectangle corners inside the incident quad projection
    rc_u = jnp.asarray([1.0, -1.0, -1.0, 1.0]) * eu
    rc_v = jnp.asarray([1.0, 1.0, -1.0, -1.0]) * ev
    # Winding sign of the projected quad.
    area2 = _cross2(cu[1] - cu[0], cv[1] - cv[0], cu[2] - cu[0], cv[2] - cv[0]) + _cross2(
        cu[2] - cu[0], cv[2] - cv[0], cu[3] - cu[0], cv[3] - cv[0]
    )
    wind = jnp.where(area2 >= 0.0, 1.0, -1.0)
    z = _cross2(
        du[None, :], dv[None, :], rc_u[:, None] - cu[None, :], rc_v[:, None] - cv[None, :]
    )  # (4 rect corners, 4 edges)
    inside_quad = jnp.all(z * wind >= -PLANE_EPSILON, axis=1)
    cand_u.append(rc_u)
    cand_v.append(rc_v)
    cand_ok.append(inside_quad)

    pu = jnp.concatenate(cand_u)      # (24,)
    pv = jnp.concatenate(cand_v)
    ok = jnp.concatenate(cand_ok)
    ph = h0 + hu * pu + hv * pv
    # Persistence margin on face distance (collision.cpp:370).
    ok = ok & (ph <= margin)

    # ---- Reduce to <= 4 contacts: deepest, then max spread ----
    def pick(valid, score):
        idx = jnp.argmax(jnp.where(valid, score, _NEG))
        found = valid[idx]
        return idx, found

    sel_idx = []
    sel_found = []
    valid = ok

    i0, f0 = pick(valid, -ph)
    sel_idx.append(i0)
    sel_found.append(f0)

    def drop_near(valid, i):
        d2 = (pu - pu[i]) ** 2 + (pv - pv[i]) ** 2
        keep = d2 >= CONTACT_MERGE_DIST_SQ
        return valid & keep

    valid = drop_near(valid, i0)
    i1, f1 = pick(valid, (pu - pu[i0]) ** 2 + (pv - pv[i0]) ** 2)
    sel_idx.append(i1)
    sel_found.append(f1 & f0)
    valid = drop_near(valid, i1)

    a01 = _cross2(pu[i1] - pu[i0], pv[i1] - pv[i0], pu - pu[i0], pv - pv[i0])
    i2, f2 = pick(valid, a01)
    sel_idx.append(i2)
    sel_found.append(f2 & f1 & f0)
    valid = drop_near(valid, i2)

    i3, f3 = pick(valid, -a01)
    sel_idx.append(i3)
    sel_found.append(f3 & f2 & f1 & f0)

    sel = jnp.stack(sel_idx)                       # (4,)
    sel_ok = jnp.stack(sel_found)                  # (4,)
    # A selected point whose max-area score is ~zero adds a degenerate
    # (collinear/duplicate) vertex; keep it anyway iff it was a distinct
    # valid candidate — matches the reference keeping boundary-duplicate
    # clip vertices that differ by > merge distance.

    fu = pu[sel]
    fv = pv[sel]
    fh = ph[sel]
    p_ref3 = face_center[None, :] + fu[:, None] * u_ax[None, :] + fv[:, None] * v_ax[None, :]
    p_inc3 = p_ref3 + fh[:, None] * n_ref[None, :]
    face_x_a = jnp.where(ref_is_a, p_ref3, p_inc3)
    face_x_b = jnp.where(ref_is_a, p_inc3, p_ref3)

    # Feature ids (collision.cpp:362-364, 381-388).
    eu_safe = jnp.where(eu > SAT_AXIS_EPSILON, eu, 1.0)
    ev_safe = jnp.where(ev > SAT_AXIS_EPSILON, ev, 1.0)
    q_u = jnp.clip(jnp.floor((fu / eu_safe + 1.0) * 7.5), 0, 15).astype(jnp.int32)
    q_v = jnp.clip(jnp.floor((fv / ev_safe + 1.0) * 7.5), 0, 15).astype(jnp.int32)
    face_type = jnp.where(ref_is_a, AXIS_FACE_A, AXIS_FACE_B).astype(jnp.int32)
    prefix = (face_type << 24) | (ref_axis.astype(jnp.int32) << 16) | (inc_axis.astype(jnp.int32) << 8)
    face_feature = prefix | (q_u << 4) | q_v
    face_count = jnp.sum(sel_ok.astype(jnp.int32))

    # --- Edge contact (collision.cpp:396-416) ----------------------------
    e_i = best_edge // 3
    e_j = best_edge % 3
    edge_normal_ab = n[6 + best_edge]

    def support_edge(axes, half, axis_index, direction):
        a1 = (axis_index + 1) % 3
        a2 = (axis_index + 2) % 3
        s1 = jnp.where(jnp.dot(direction, axes[a1]) >= 0.0, 1.0, -1.0)
        s2 = jnp.where(jnp.dot(direction, axes[a2]) >= 0.0, 1.0, -1.0)
        return axes[a1] * (half[a1] * s1) + axes[a2] * (half[a2] * s2), axes[axis_index] * half[axis_index]

    ec_a, eh_a = support_edge(axes_a, half_a, e_i, edge_normal_ab)
    ec_b, eh_b = support_edge(axes_b, half_b, e_j, -edge_normal_ab)
    p0 = pos_a + ec_a - eh_a
    p1 = pos_a + ec_a + eh_a
    q0 = pos_b + ec_b - eh_b
    q1 = pos_b + ec_b + eh_b

    # closestPointsOnSegments (collision.cpp:265-311), branch-free.
    d1 = p1 - p0
    d2 = q1 - q0
    r = p0 - q0
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b
    a_safe = jnp.where(a > SAT_AXIS_EPSILON, a, 1.0)
    e_safe = jnp.where(e > SAT_AXIS_EPSILON, e, 1.0)
    s = jnp.where(
        jnp.abs(denom) > SAT_AXIS_EPSILON,
        jnp.clip((b * f - c * e) / jnp.where(jnp.abs(denom) > SAT_AXIS_EPSILON, denom, 1.0), 0.0, 1.0),
        0.0,
    )
    t = (b * s + f) / e_safe
    s = jnp.where(t < 0.0, jnp.clip(-c / a_safe, 0.0, 1.0), jnp.where(t > 1.0, jnp.clip((b - c) / a_safe, 0.0, 1.0), s))
    t = jnp.clip(t, 0.0, 1.0)
    edge_x_a = p0 + d1 * s
    edge_x_b = q0 + d2 * t
    edge_feature = (AXIS_EDGE << 24) | (e_i.astype(jnp.int32) << 8) | e_j.astype(jnp.int32)

    # --- Select face vs edge vs separated --------------------------------
    x_a = jnp.where(use_edge, jnp.broadcast_to(edge_x_a, (4, 3)), face_x_a)
    x_b = jnp.where(use_edge, jnp.broadcast_to(edge_x_b, (4, 3)), face_x_b)
    normal_ba = jnp.broadcast_to(
        -jnp.where(use_edge, edge_normal_ab, normal_ab), (4, 3)
    )
    feature = jnp.where(use_edge, edge_feature, face_feature)
    count = jnp.where(use_edge, 1, face_count)
    count = jnp.where(separated, 0, count)
    slot_ok = (jnp.arange(4) < count) & jnp.where(use_edge, True, sel_ok)
    # Compact semantics: the reference packs contacts densely; our reduction
    # already yields the valid picks first except in rare degenerate cases,
    # so treat slot validity as the mask (count = popcount).
    slot_ok = jnp.where(separated, False, jnp.where(use_edge, jnp.arange(4) < 1, sel_ok))
    count = jnp.sum(slot_ok.astype(jnp.int32))

    return count, jnp.where(slot_ok, feature, -1), x_a, x_b, normal_ba, slot_ok


@functools.partial(jax.jit, static_argnames=("margin",))
def collide_pairs(pos, quat, size, ia, ib, pair_valid, margin=0.02):
    """Vmapped narrowphase over candidate pairs.

    pos (N,3), quat (N,4), size (N,3); ia/ib (P,) body indices; pair_valid
    (P,) mask.  Returns dict of per-pair contact data with body-local anchor
    points (``rA``/``rB``, collision.cpp:195-196).
    """
    ia_c = jnp.clip(ia, 0, pos.shape[0] - 1)
    ib_c = jnp.clip(ib, 0, pos.shape[0] - 1)
    half = size * 0.5

    count, feature, x_a, x_b, normal_ba, slot_ok = jax.vmap(
        lambda pa, qa, ha, pb, qb, hb: _collide_one(pa, qa, ha, pb, qb, hb, margin)
    )(pos[ia_c], quat[ia_c], half[ia_c], pos[ib_c], quat[ib_c], half[ib_c])

    slot_ok = slot_ok & pair_valid[:, None]
    count = jnp.where(pair_valid, count, 0)
    feature = jnp.where(slot_ok, feature, -1)

    r_a = quat_rotate_inv(quat[ia_c][:, None, :], x_a - pos[ia_c][:, None, :])
    r_b = quat_rotate_inv(quat[ib_c][:, None, :], x_b - pos[ib_c][:, None, :])
    return {
        "count": count,
        "feature": feature,
        "r_a": r_a,
        "r_b": r_b,
        "normal": normal_ba,
        "slot_ok": slot_ok,
    }
