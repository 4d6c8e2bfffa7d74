"""Replicated body-major constraint core (shared by XLA and Pallas backends).

Every body owns D neighbor slots shaped (D, G, 128) with bodies in the lane
dimension (body n = group n//128, lane n%128).  Each active pair appears
twice — once per endpoint — and all slot math is computed in the *canonical*
pair frame (A = lower index): both replicas see identical operands and the
same instruction stream, so lambda/penalty/stick updates stay bit-identical
across replicas with zero communication.  Per-body force aggregation is a
plain sum over the D axis — the gather/scatter-free design this backend's
pathological gather performance demands.

The only cross-body data movement is fetching the neighbor's pose, done
through an injected ``gather(table_g128, idx_dg128)`` callable:
  - XLA backend: native gather (fine on CPU).
  - Pallas backend: G-way broadcast-select + lane-local take_along_axis.

Physics semantics mirror reference manifold.cpp / solver.cpp row for row;
see ops/contacts git history and per-function docstrings for line citations.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .. import cm
from ..state import Contacts

_UP = (0.0, 1.0, 0.0)


# ---------------------------------------------------------------------------
# Body-table gather strategies
# ---------------------------------------------------------------------------

def body_iota(g: int):
    """(G, 128) int32 body indices."""
    return (
        lax.broadcasted_iota(jnp.int32, (g, 128), 0) * 128
        + lax.broadcasted_iota(jnp.int32, (g, 128), 1)
    )


def xla_gather(table, idx):
    """table (G, 128), idx (D, G, 128) -> (D, G, 128) via native gather."""
    flat = table.reshape(-1)
    return flat[idx.reshape(-1)].reshape(idx.shape)


def select_gather(table, idx):
    """Gather via G-way broadcast-select + lane take_along_axis.

    Mosaic-compatible: the only dynamic op is a same-shape gather along the
    lane axis.  Cost: G * (1 lane-gather + 1 select) per component.  The
    flattened row count is padded to a multiple of 8 sublanes — Mosaic's
    lane-gather lowering rejects sub-vreg shapes (seen with 1-slot joint
    tables, (1, 128)).
    """
    d, g, _ = idx.shape
    rows = d * g
    pad = (-rows) % 8
    col = (idx & 127).reshape(rows, 128)
    row = (idx >> 7).reshape(rows, 128)
    if pad:
        col = jnp.concatenate([col, jnp.zeros((pad, 128), col.dtype)], axis=0)
        row = jnp.concatenate([row, jnp.zeros((pad, 128), row.dtype)], axis=0)
    acc = jnp.zeros((rows + pad, 128), table.dtype)
    for k in range(table.shape[0]):
        bc = jnp.broadcast_to(table[k][None, :], (rows + pad, 128))
        gath = jnp.take_along_axis(bc, col, axis=1)
        acc = jnp.where(row == k, gath, acc)
    return acc[:rows].reshape(d, g, 128)


# ---------------------------------------------------------------------------
# Canonical pair frames
# ---------------------------------------------------------------------------

def gather_comps(comps, idx, gather):
    return tuple(gather(c, idx) for c in comps)


def canonical_select(is_a, own, other):
    """Canonical A/B selection: A-side value where this body is A."""
    a = cm.where(is_a, own, other) if isinstance(own, tuple) else jnp.where(is_a, own, other)
    b = cm.where(is_a, other, own) if isinstance(own, tuple) else jnp.where(is_a, other, own)
    return a, b


def pair_frames(cache_other, body, gather, own_iota=None, table=None):
    """Gather neighbor state and build canonical A/B frames.

    ``body``: dict of (G, 128) component arrays (pos 3, quat 4, half 3,
    inv_mass, friction) for the bodies OWNING the slots; ``table`` (default
    ``body``) is the dict gathers read partner state from — the grid
    backend passes a G-group block as ``body`` and the full table here.
    ``own_iota``: (G, 128) global body indices of the owning bodies
    (defaults to 0..G*128-1).  Returns canonical frame dict; all entries
    shaped (D, G, 128)."""
    d, g, _ = cache_other.shape
    table = body if table is None else table
    valid = cache_other >= 0
    idx = jnp.where(valid, cache_other, 0)
    own_n = (body_iota(g) if own_iota is None else own_iota)[None]
    is_a = own_n < idx

    own_pos = tuple(c[None] for c in body["pos"])
    own_quat = tuple(c[None] for c in body["quat"])
    oth_pos = gather_comps(table["pos"], idx, gather)
    oth_quat = gather_comps(table["quat"], idx, gather)

    pa, pb = canonical_select(is_a, own_pos, oth_pos)
    qa, qb = canonical_select(is_a, own_quat, oth_quat)
    return {
        "valid": valid,
        "is_a": is_a,
        "idx": idx,
        "pa": pa, "qa": qa, "pb": pb, "qb": qb,
    }


def pair_constants(cache_other, body, gather, table=None):
    """Pair-static scalars: friction mu = sqrt(muA muB) (manifold.cpp:73) and
    the normal-cap mass scale (manifold.cpp:199-204).  Symmetric in the two
    bodies, hence replica-identical by construction."""
    table = body if table is None else table
    valid = cache_other >= 0
    idx = jnp.where(valid, cache_other, 0)
    oth_fric = gather(table["friction"], idx)
    oth_invm = gather(table["inv_mass"], idx)
    mu = jnp.sqrt(body["friction"][None] * oth_fric)
    inv_sum = body["inv_mass"][None] + oth_invm
    mass_scale = jnp.where(inv_sum > 1.0e-6, 1.0 / jnp.maximum(inv_sum, 1.0e-6), 1.0)
    return {"mu": mu, "mass_scale": mass_scale, "valid": valid, "idx": idx}


# ---------------------------------------------------------------------------
# Phase 2: narrowphase + cross-step match + warmstart init
# ---------------------------------------------------------------------------

def precull_near(dc: int, neighbors, body, params, gather, own_iota=None,
                 table=None):
    """Compact the (D, G, 128) candidate slots to the ``dc`` slots whose
    6-face-axis separation is within the collision margin, BEFORE the
    expensive 15-axis SAT + clipping runs.

    This is the contact-cache width reduction (Capacity.cache_degree): the
    broadphase must provision D candidate slots for the worst-case
    *proximity* degree (Stress1000: 20 measured), but slots whose best
    face-axis separation exceeds the margin provably produce no contacts
    (SAT requires separation <= margin on ALL 15 axes, and the 6 face axes
    are a subset — the same early-out testAxis applies,
    collision.cpp:231-234), so the full narrowphase, the warmstart match,
    and the whole solve loop run at the realized near-degree width
    (max 10 measured on Stress1000 vs 20 candidates).  The cull keeps
    candidate (deepest-gap-first) order, so a non-overflowing culled run
    is value-identical to the full-width one: culled slots would have
    contributed exact zeros to every masked reduction.  Overflow
    (near slots beyond dc) is dropped and counted — never silent
    (diagnostics degree_overflow).

    The margin gets a +1e-4 guard so f32 rounding differences between this
    6-axis evaluation and the SAT's own axis tests can never cull a slot
    the SAT would have accepted at the boundary.

    Returns (neighbors (dc, G, 128), dropped count)."""
    table = body if table is None else table
    valid = neighbors >= 0
    idx = jnp.where(valid, neighbors, 0)
    pp = gather_comps(table["pos"], idx, gather)
    pq = gather_comps(table["quat"], idx, gather)
    ph = gather_comps(table["half"], idx, gather)
    own_pos = tuple(c[None] for c in body["pos"])
    delta = tuple(pp[k] - own_pos[k] for k in range(3))
    own_ax = [tuple(c[None] for c in ax)
              for ax in cm.q_axes(tuple(body["quat"]))]
    own_half = tuple(h[None] for h in body["half"])
    par_ax = cm.q_axes(tuple(pq))

    def proj(axes, half, n_vec):
        return sum(
            half[k] * jnp.abs(
                axes[k][0] * n_vec[0] + axes[k][1] * n_vec[1]
                + axes[k][2] * n_vec[2]
            )
            for k in range(3)
        )

    best = jnp.full(neighbors.shape, -1.0e9, jnp.float32)
    for n_vec in list(own_ax) + list(par_ax):
        sep = (
            jnp.abs(sum(delta[i] * n_vec[i] for i in range(3)))
            - proj(own_ax, own_half, n_vec)
            - proj(par_ax, ph, n_vec)
        )
        best = jnp.maximum(best, sep)
    keep = valid & (best <= params.collision_margin + 1.0e-4)

    d = neighbors.shape[0]
    run = jnp.zeros_like(neighbors[0])
    rank = []
    for dd in range(d):
        rank.append(run)
        run = run + keep[dd].astype(jnp.int32)
    dropped = jnp.sum(jnp.maximum(run - dc, 0))
    out = []
    empty = jnp.full_like(neighbors[0], -1)
    for t in range(dc):
        acc = empty
        for dd in range(d):
            acc = jnp.where(keep[dd] & (rank[dd] == t), neighbors[dd], acc)
        out.append(acc)
    return jnp.stack(out), dropped


def collide_and_init(old: Contacts, neighbors, body, params, gather,
                     own_iota=None, table=None):
    """Replicated narrowphase + warmstart transfer (manifold.cpp:71-175,
    solver.cpp:281-293).  Returns (Contacts, dropped-manifold count).

    ``neighbors`` (D, G, 128): new per-body neighbor indices (-1 empty),
    evaluated at the pre-prediction poses.  When the ``old`` cache is
    NARROWER than the candidate list (Capacity.cache_degree < max_degree),
    the candidates are pre-culled to the cache width by the cheap
    6-face-axis separation test BEFORE the 15-axis SAT runs
    (``precull_near``), so the narrowphase, the warmstart match, and
    everything downstream runs at the smaller width.  Cross-step pair
    matching is a D x D_old masked compare *within each body's own slots*
    — no global merge needed because the cache is body-local.
    ``own_iota``/``table``: grid-backend blocking, see pair_frames.
    """
    from .narrowphase_cm import collide_pairs_cm

    d_new, g, _ = neighbors.shape
    table = body if table is None else table
    d_cache = old.other.shape[0]
    dropped = jnp.int32(0)
    if d_cache < d_new:
        neighbors, dropped = precull_near(
            d_cache, neighbors, body, params, gather, own_iota, table
        )
    frames = pair_frames(neighbors, body, gather, own_iota, table)
    valid = frames["valid"]
    is_a = frames["is_a"]

    own_half = tuple(c[None] for c in body["half"])
    oth_half = gather_comps(table["half"], frames["idx"], gather)
    ha, hb = canonical_select(is_a, own_half, oth_half)

    geom = collide_pairs_cm(
        {"pos": frames["pa"], "quat": frames["qa"], "half": ha},
        {"pos": frames["pb"], "quat": frames["qb"], "half": hb},
        params.collision_margin,
    )
    slot_ok = [ok & valid for ok in geom["slot_ok"]]
    feature = [jnp.where(ok, ft, -1) for ok, ft in zip(slot_ok, geom["feature"])]
    count = jnp.where(valid, geom["count"], 0)
    g_normal = geom["normal"]
    g_xa = geom["x_a"]
    g_xb = geom["x_b"]

    # ---- pair match against the body's OWN old slots ----
    # Pass 1: find each new slot's matching old-slot index (cheap compare
    # loop).  Pass 2: fetch every cached field with ONE same-shape
    # take_along_axis over the D axis per field (Mosaic-friendly), instead
    # of a D x fields select chain.
    d_old = old.other.shape[0]
    found = jnp.zeros_like(valid)
    match_d = jnp.zeros_like(neighbors)
    for dp in range(d_old):
        hit = valid & (old.other[dp][None] == neighbors) & (old.count[dp][None] > 0) & ~found
        found = found | hit
        match_d = jnp.where(hit, dp, match_d)

    # Field fetch by matched slot index.  (A D-axis take_along_axis would be
    # ideal, but Mosaic only gathers within one 8-sublane vreg and only in
    # 2D, which makes the chunked formulation op-count-equivalent to plain
    # selects — so selects it is.)
    def fetch(arr):
        out = arr[0][None]
        for dp in range(1, d_old):
            out = jnp.where(match_d == dp, arr[dp][None], out)
        return out

    foundf = found
    o_count = jnp.where(foundf, fetch(old.count), 0)
    o_feature = [jnp.where(foundf, fetch(old.feature[s]), -1) for s in range(4)]
    o_stick = [fetch(old.stick[s].astype(jnp.int32)) > 0 for s in range(4)]
    o_normal = [fetch(old.normal[k]) for k in range(3)]
    o_r_a = [[fetch(old.r_a[s, k]) for k in range(3)] for s in range(4)]
    o_r_b = [[fetch(old.r_b[s, k]) for k in range(3)] for s in range(4)]
    o_lam = [fetch(old.lam[r]) for r in range(12)]
    o_pen = [fetch(old.penalty[r]) for r in range(12)]

    new_n_unit = cm.normalize_or(g_normal, _UP)
    old_n_unit = cm.normalize_or(tuple(o_normal), new_n_unit)
    normal_dot = cm.dot(new_n_unit, old_n_unit)

    # ---- within-pair greedy feature match (manifold.cpp:109-119) ----
    used = [jnp.zeros_like(valid) for _ in range(4)]
    n_unit, t1, t2 = _contact_basis(g_normal)

    r_a_slots, r_b_slots, stick_slots = [], [], []
    lam_rows, pen_rows = [], []
    c0n_slots, c0t1_slots, c0t2_slots = [], [], []
    decay = params.alpha * params.gamma
    ws2 = params.warmstart_max_drift**2
    st2 = params.stick_anchor_max_drift**2

    old_mid = []
    for s in range(4):
        o_ra = tuple(o_r_a[s])
        o_rb = tuple(o_r_b[s])
        mid = cm.scale(
            cm.add(
                cm.add(frames["pa"], cm.q_rotate(frames["qa"], o_ra)),
                cm.add(frames["pb"], cm.q_rotate(frames["qb"], o_rb)),
            ),
            0.5,
        )
        old_mid.append(mid)

    for i in range(4):
        slot_valid = slot_ok[i]
        matched = jnp.zeros_like(valid)
        m_mid = tuple(jnp.zeros_like(frames["pa"][0]) for _ in range(3))
        m_stick = jnp.zeros_like(valid)
        m_r_a = tuple(jnp.zeros_like(frames["pa"][0]) for _ in range(3))
        m_r_b = tuple(jnp.zeros_like(frames["pa"][0]) for _ in range(3))
        m_lam = [jnp.zeros_like(frames["pa"][0]) for _ in range(3)]
        m_pen = [jnp.zeros_like(frames["pa"][0]) for _ in range(3)]
        for j in range(4):
            o_ok = (jnp.int32(j) < o_count) & (o_feature[j] >= 0)
            elig = (o_feature[j] == feature[i]) & o_ok & ~used[j] & slot_valid & ~matched & found
            matched = matched | elig
            used[j] = used[j] | elig
            m_mid = cm.where(elig, old_mid[j], m_mid)
            m_stick = cm.bwhere(elig, o_stick[j], m_stick)
            m_r_a = cm.where(elig, tuple(o_r_a[j]), m_r_a)
            m_r_b = cm.where(elig, tuple(o_r_b[j]), m_r_b)
            for k in range(3):
                m_lam[k] = jnp.where(elig, o_lam[j * 3 + k], m_lam[k])
                m_pen[k] = jnp.where(elig, o_pen[j * 3 + k], m_pen[k])

        new_r_a = cm.q_rotate_inv(frames["qa"], cm.sub(g_xa[i], frames["pa"]))
        new_r_b = cm.q_rotate_inv(frames["qb"], cm.sub(g_xb[i], frames["pb"]))
        new_mid = cm.scale(cm.add(g_xa[i], g_xb[i]), 0.5)

        drift2 = cm.length_sq(cm.sub(new_mid, m_mid))
        warm = (
            matched
            & (normal_dot >= params.warmstart_normal_min_dot)
            & (drift2 <= ws2)
        )
        lam_i = [jnp.where(warm, l, 0.0) for l in m_lam]
        pen_i = [
            jnp.where(
                warm,
                jnp.clip(pe, params.penalty_min, params.manifold_penalty_cap),
                params.penalty_min,
            )
            for pe in m_pen
        ]
        reuse = (
            warm
            & m_stick
            & (normal_dot >= params.stick_normal_min_dot)
            & (drift2 <= st2)
        )
        stick_i = m_stick & reuse
        r_a_i = cm.where(reuse, m_r_a, new_r_a)
        r_b_i = cm.where(reuse, m_r_b, new_r_b)

        # warmstart decay (solver.cpp:281-293); contact rows are hard
        if not params.post_stabilize:
            lam_i = [l * decay for l in lam_i]
        pen_i = [
            jnp.clip(pe * params.gamma, params.penalty_min, params.penalty_max)
            for pe in pen_i
        ]
        lam_i = [jnp.where(slot_valid, l, 0.0) for l in lam_i]
        pen_i = [jnp.where(slot_valid, pe, 0.0) for pe in pen_i]

        # alpha-stabilization cache at pre-step poses (manifold.cpp:159-171)
        p_a_i = cm.add(frames["pa"], cm.q_rotate(frames["qa"], r_a_i))
        p_b_i = cm.add(frames["pb"], cm.q_rotate(frames["qb"], r_b_i))
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
        other=jnp.where(count > 0, neighbors, -1),
        count=count,
        feature=jnp.stack(feature),
        r_a=jnp.stack([jnp.stack(v) for v in r_a_slots]),
        r_b=jnp.stack([jnp.stack(v) for v in r_b_slots]),
        normal=jnp.stack(n_unit),
        stick=jnp.stack(stick_slots),
        c0_n=jnp.stack(c0n_slots),
        c0_t1=jnp.stack(c0t1_slots),
        c0_t2=jnp.stack(c0t2_slots),
        lam=jnp.stack(lam_rows),
        penalty=jnp.stack(pen_rows),
    ), dropped


def _contact_basis(normal):
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


# ---------------------------------------------------------------------------
# Iteration-loop row math
# ---------------------------------------------------------------------------

def geometry_static(cache: Contacts, consts, own_iota=None):
    """Loop-invariant geometry: contact basis (fixed per step once the
    manifold normal is set, manifold.cpp:160-161), slot masks, canonical
    side flags.  Hoisted out of the solver iterations."""
    idx = consts["idx"]
    valid = consts["valid"]
    g = (body_iota(cache.other.shape[1]) if own_iota is None else own_iota)[None]
    return {
        "basis": _contact_basis((cache.normal[0], cache.normal[1], cache.normal[2])),
        "is_a": g < idx,
        "slot_ok": [(jnp.int32(s) < cache.count) & valid for s in range(4)],
    }


def geometry_pose(cache: Contacts, static, body_pose, consts, gather,
                  table_pose=None):
    """Pose-dependent geometry per slot (manifold.cpp:184-196): world lever
    arms and raw separation/slips.  ``body_pose``: dict with 'pos' (3 comps)
    and 'quat' (4 comps), (G, 128); ``table_pose`` is the gather table
    (defaults to ``body_pose`` — grid backend passes the full table)."""
    table_pose = body_pose if table_pose is None else table_pose
    idx = consts["idx"]
    is_a = static["is_a"]
    n_unit, t1, t2 = static["basis"]

    own_pos = tuple(c[None] for c in body_pose["pos"])
    own_quat = tuple(c[None] for c in body_pose["quat"])
    oth_pos = gather_comps(table_pose["pos"], idx, gather)
    oth_quat = gather_comps(table_pose["quat"], idx, gather)
    pa, pb = canonical_select(is_a, own_pos, oth_pos)
    qa, qb = canonical_select(is_a, own_quat, oth_quat)

    rw_a, rw_b, sep, slip1, slip2 = [], [], [], [], []
    for s in range(4):
        ra = cm.q_rotate(qa, (cache.r_a[s, 0], cache.r_a[s, 1], cache.r_a[s, 2]))
        rb = cm.q_rotate(qb, (cache.r_b[s, 0], cache.r_b[s, 1], cache.r_b[s, 2]))
        delta = cm.sub(cm.add(pa, ra), cm.add(pb, rb))
        rw_a.append(ra)
        rw_b.append(rb)
        sep.append(cm.dot(delta, n_unit))
        slip1.append(cm.dot(delta, t1))
        slip2.append(cm.dot(delta, t2))
    return {
        "basis": static["basis"],
        "rw_a": rw_a,
        "rw_b": rw_b,
        "sep": sep,
        "slip1": slip1,
        "slip2": slip2,
        "is_a": is_a,
        "slot_ok": static["slot_ok"],
    }


def eval_geometry(cache: Contacts, body_pose, consts, gather, own_iota=None):
    """Full geometry evaluation (static + pose-dependent parts).
    ``own_iota``: global body ids of the owning rows (sharded worlds)."""
    return geometry_pose(
        cache, geometry_static(cache, consts, own_iota), body_pose, consts,
        gather,
    )


def eval_rows(geom, cache: Contacts, consts, lam, penalty, stick, alpha, params):
    """computeConstraint row math (manifold.cpp:193-245): biased C, cone
    bounds, in-place lambda projection, stick update.  lam/penalty are
    (12, D, G, 128) stacks; stick (4, D, G, 128)."""
    bias = jnp.clip(1.0 - alpha, 0.0, 1.0)
    cap = params.normal_force_cap * consts["mass_scale"]

    c_rows = [None] * 12
    fmin = [None] * 12
    fmax = [None] * 12
    lam_out = [None] * 12
    stick_out = [None] * 4

    for s in range(4):
        c_n = (geom["sep"][s] - params.normal_contact_margin) + bias * cache.c0_n[s]
        c_t1 = geom["slip1"][s] + bias * cache.c0_t1[s]
        c_t2 = geom["slip2"][s] + bias * cache.c0_t2[s]

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
            & geom["slot_ok"][s]
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

    row_ok = [geom["slot_ok"][r // 3] for r in range(12)]
    return {"C": c_rows, "fmin": fmin, "fmax": fmax, "lam": lam_out,
            "stick": stick_out, "row_ok": row_ok}


def primal_force(rows, penalty):
    """f = clamp(penalty*C + lambda, fmin, fmax)  (solver.cpp:379-381)."""
    return [
        jnp.where(
            rows["row_ok"][r],
            jnp.clip(penalty[r] * rows["C"][r] + rows["lam"][r],
                     rows["fmin"][r], rows["fmax"][r]),
            0.0,
        )
        for r in range(12)
    ]


def body_forces(geom, f_rows):
    """Own-side generalized force, reduced over the D axis.

    Per slot, this body's Jacobians are J_lin = sign*b, J_ang =
    sign*(rw_own x b) with sign = +1 when the body is canonical A
    (solver.cpp:375-398).  Returns dict with F(3), T(3) per-body (G, 128)
    components — the fresh (gradient) half of the Newton system.
    """
    n_unit, t1, t2 = geom["basis"]
    basis = (n_unit, t1, t2)
    sign = jnp.where(geom["is_a"], 1.0, -1.0)

    F = [0.0] * 3
    T = [0.0] * 3
    for s in range(4):
        rw = cm.where(geom["is_a"], geom["rw_a"][s], geom["rw_b"][s])
        fs = (f_rows[s * 3], f_rows[s * 3 + 1], f_rows[s * 3 + 2])
        fv = tuple(
            basis[0][k] * fs[0] + basis[1][k] * fs[1] + basis[2][k] * fs[2]
            for k in range(3)
        )
        tv = cm.cross(rw, fv)
        for k in range(3):
            F[k] = F[k] + sign * fv[k]
            T[k] = T[k] + sign * tv[k]
    return {
        "F": [jnp.sum(x, axis=0) for x in F],
        "T": [jnp.sum(x, axis=0) for x in T],
    }


def body_matrix(geom, f_rows, penalty, iiw_own):
    """Own-side 6x6 Hessian contributions, reduced over the D axis.

    Quadratic terms drop the Jacobian sign (solver.cpp:384-397).  Returns
    per-body (G, 128) components m_ll(6), m_la(9), m_aa(6), gyro(3);
    ``iiw_own``: 6 world inverse-inertia comps (G, 128) of the own body.
    The curvature half of the Newton system: the solver may reuse it for
    several iterations (modified Newton — the fixed point is set by the
    fresh gradient, staleness only changes the convergence path).
    """
    n_unit, t1, t2 = geom["basis"]
    basis = (n_unit, t1, t2)

    m_ll = [0.0] * 6
    m_la = [0.0] * 9
    m_aa = [0.0] * 6
    gyro = [0.0] * 3

    for s in range(4):
        rw = cm.where(geom["is_a"], geom["rw_a"][s], geom["rw_b"][s])
        for r in range(3):
            b = basis[r]
            pe = penalty[s * 3 + r] * geom["slot_ok"][s]
            c = cm.cross(rw, b)
            m_ll[0] += pe * b[0] * b[0]
            m_ll[1] += pe * b[0] * b[1]
            m_ll[2] += pe * b[0] * b[2]
            m_ll[3] += pe * b[1] * b[1]
            m_ll[4] += pe * b[1] * b[2]
            m_ll[5] += pe * b[2] * b[2]
            for i in range(3):
                for j in range(3):
                    m_la[i * 3 + j] += pe * b[i] * c[j]
            m_aa[0] += pe * c[0] * c[0]
            m_aa[1] += pe * c[0] * c[1]
            m_aa[2] += pe * c[0] * c[2]
            m_aa[3] += pe * c[1] * c[1]
            m_aa[4] += pe * c[1] * c[2]
            m_aa[5] += pe * c[2] * c[2]
            ic = (
                iiw_own[0][None] * c[0] + iiw_own[1][None] * c[1] + iiw_own[2][None] * c[2],
                iiw_own[1][None] * c[0] + iiw_own[3][None] * c[1] + iiw_own[4][None] * c[2],
                iiw_own[2][None] * c[0] + iiw_own[4][None] * c[1] + iiw_own[5][None] * c[2],
            )
            gcr = cm.cross(c, ic)
            af = jnp.abs(f_rows[s * 3 + r])
            gyro[0] += jnp.abs(gcr[0]) * af
            gyro[1] += jnp.abs(gcr[1]) * af
            gyro[2] += jnp.abs(gcr[2]) * af

    return {
        "m_ll": [jnp.sum(x, axis=0) for x in m_ll],
        "m_la": [jnp.sum(x, axis=0) for x in m_la],
        "m_aa": [jnp.sum(x, axis=0) for x in m_aa],
        "gyro": [jnp.sum(x, axis=0) for x in gyro],
    }


def body_system(geom, f_rows, penalty, iiw_own):
    """Forces + matrix in one call (reference per-iteration behavior)."""
    out = dict(body_forces(geom, f_rows))
    out.update(body_matrix(geom, f_rows, penalty, iiw_own))
    return out


def dual_update(rows, geom, penalty, beta, params):
    """Dual ascent + penalty ramp (solver.cpp:411-429) at post-primal poses.
    Replica-identical because every operand is canonical."""
    n_unit, t1, t2 = geom["basis"]
    basis = (n_unit, t1, t2)
    lam_new = [None] * 12
    pen_new = [None] * 12
    for s in range(4):
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
                jnp.minimum(penalty[r] + gain * jnp.abs(rows["C"][r]),
                            params.manifold_penalty_cap),
                penalty[r],
            )
            ok = rows["row_ok"][r]
            lam_new[r] = jnp.where(ok, lam_r, 0.0)
            pen_new[r] = jnp.where(ok, pe, penalty[r])
    return jnp.stack(lam_new), jnp.stack(pen_new), jnp.stack(rows["stick"])
