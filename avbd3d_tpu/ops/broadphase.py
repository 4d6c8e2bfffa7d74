"""Broadphase: all-pairs world-AABB culling to per-body neighbor lists.

The reference broadphase is an O(n^2) double loop over linked lists doing a
bounding-SPHERE test that allocates a ``Manifold`` per overlapping pair
(solver.cpp:261-270) and skips pairs already linked by any force via
``isConstrainedTo`` (rigid.cpp:61-69).

This rebuild culls with world-axis-aligned bounding boxes instead: for unit
cubes the bounding sphere's radius (0.866) is 1.73x the half-extent, so a
settled pile shows ~21 sphere candidates per body where only ~10 pairs can
actually touch — and every candidate slot costs narrowphase + solver work
in the (D, G, 128) kernels.  The AABB "gap" is the Chebyshev surface gap
``max_k(|d_k| - (whA_k + whB_k))`` (wh = world half-extents, the box
projected onto the world axes): exactly symmetric, a true lower bound on
box distance (so AABB gap > persistence margin proves no contact), and
roughly halves the realized candidate degree on box piles.  Rotation grows
wh between cache refreshes; ``refresh_or_reuse`` bounds that with a chord
term (see below).

TPU rebuild, in two stages:

1. ``candidate_lists`` (XLA): one (N, N) masked tensor op + per-row
   ``top_k`` compacts each body's overlapping partners into D static
   neighbor slots, deepest-gap-first.  Gaps are packed into strictly unique
   int32 keys ``quantized_gap * N + partner`` so selection is exactly
   deterministic and stage 2 is pure integer compares.
2. ``symmetric_filter``: a dynamic-dynamic pair is kept only if BOTH
   endpoints kept it (a one-sided contact force would inject momentum).
   "Partner j kept me" is the exact threshold test ``key(j, i) <= (largest
   key j kept)`` — valid because keys are unique and d2 is bit-exact
   symmetric ((a-b)^2 == (b-a)^2 in IEEE).  The filter needs one gather per
   slot, which is catastrophically slow in XLA on this stack (~7 ns/element)
   but free inside a Mosaic kernel — so the Pallas backend runs it inside
   kernel A (solver_tpu.py) while the portable path runs it here with the
   native gather.

Exclusions (jointed / spring-linked / ignored pairs — isConstrainedTo
semantics) are applied to the (N, N) mask *before* slot selection, so a
never-colliding partner cannot consume one of the D neighbor slots.
Overflow (candidates dropped by capacity or symmetry) is counted, never
silent.

Static bodies get no slots: they are never position-solved
(solver.cpp:345-347), so a static-dynamic pair lives only in the dynamic
body's replica.  This matters for capacity — a ground slab overlaps every
body's bounding sphere.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

INT32_MIN = jnp.int32(-(2**31) + 1)
INT32_MAX = jnp.int32(2**31 - 1)


def world_halves(quat_cg, half_cg):
    """World-frame AABB half-extents of oriented boxes.

    wh_k = sum_j half_j * |axes_j[k]| — the box projected onto world axis k
    (axes = the body axes, columns of R).  Inputs component tuples/arrays of
    any matching shape; returns a 3-tuple."""
    from .. import cm

    axes = cm.q_axes(tuple(quat_cg))
    return tuple(
        sum(half_cg[j] * jnp.abs(axes[j][k]) for j in range(3))
        for k in range(3)
    )


def _rot_chord(quat_cg, anchor_quat_cg, radius_g):
    """Upper bound on any surface point's motion due to rotation since the
    anchor pose: chord = 2*sin(theta/2)*radius = 2*|vec(q (x) qa*)|*radius
    for unit quaternions.  Also bounds the world-AABB extent growth."""
    from .. import cm

    q = tuple(quat_cg[k] for k in range(4))
    qa = tuple(anchor_quat_cg[k] for k in range(4))
    dq = cm.q_mul(q, (-qa[0], -qa[1], -qa[2], qa[3]))
    svec = jnp.sqrt(dq[0] ** 2 + dq[1] ** 2 + dq[2] ** 2)
    return 2.0 * jnp.minimum(svec, 1.0) * jnp.maximum(radius_g, 0.0)


def _pytree(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree
@dataclasses.dataclass(frozen=True)
class BroadphaseCache:
    """Candidate lists + the body positions they were computed at.

    Candidate selection is run with the AABB gaps enlarged by
    ``params.bp_margin``; the lists then remain an exact superset of all
    contact-capable pairs while BOTH of these hold (checked in
    ``refresh_or_reuse``), where a body's "surface motion" is
    |center displacement| + rotation chord (``_rot_chord`` — the chord also
    bounds world-AABB extent growth, so one term covers both):

    1. every moved body's compensated surface motion |disp - t| + chord is
       within margin/2, where t is any common translation (we use the mean
       displacement of moved bodies) — a pair's AABB gap then shrank by
       <= margin, so no non-candidate mover pair can have closed its
       > margin anchor gap;
    2. no moved body's raw surface motion exceeds ``slack`` + margin, where
       ``slack`` is the smallest positive anchor gap from any dynamic body
       to any STATIC body — static bodies don't share the common
       translation, so mover-static pairs need the uncompensated bound.
       When every static body was already a candidate of everything at
       refresh, slack is +inf and coherent free-fall never invalidates the
       cache.

    In slow regimes (a settled pile) AND coherently-moving regimes (a
    raining swarm) the O(N^2) + top_k stage amortizes to near zero while
    narrowphase always sees fresh positions.  The whole bundle refreshes
    atomically, keeping the symmetric-filter threshold test consistent."""

    anchor: Any        # (3, G, 128) positions at last refresh
    anchor_quat: Any   # (4, G, 128) orientations at last refresh
    nb: Any            # (D, G, 128) int32 candidate partner (-1 empty)
    key: Any           # (D, G, 128) int32 selection keys
    thr: Any           # (G, 128) int32 largest key each body kept
    cand: Any          # () int32 directed candidate-slot count at refresh
    slack: Any         # () f32 min positive dynamic->static anchor gap (1e9=inf)
    dropped: Any       # () int32 directed slots dropped by top_k capacity

    def replace(self, **kw) -> "BroadphaseCache":
        return dataclasses.replace(self, **kw)


def empty_bp_cache(n_groups: int, degree: int) -> BroadphaseCache:
    g = n_groups
    return BroadphaseCache(
        anchor=jnp.full((3, g, 128), 1.0e9, jnp.float32),  # forces refresh
        anchor_quat=jnp.zeros((4, g, 128), jnp.float32),
        nb=jnp.full((degree, g, 128), -1, jnp.int32),
        key=jnp.zeros((degree, g, 128), jnp.int32),
        thr=jnp.zeros((g, 128), jnp.int32),
        cand=jnp.int32(0),
        slack=jnp.float32(0.0),
        dropped=jnp.int32(1),   # blocks the ballistic path until a refresh
    )


def refresh_or_reuse(bp: BroadphaseCache, b, exclusions, degree: int,
                     margin: float, comm=None,
                     window: int = 0) -> BroadphaseCache:
    """Rebuild the candidate lists only when the cached superset guarantee
    no longer holds (the two conditions in BroadphaseCache).  ``b``: the
    Bodies SoA (pos/quat/size/radius/dynamic are read).

    The moved-body set includes bodies that are static NOW but have moved
    since the anchor (fall-frozen bodies): their pairs against live movers
    were covered by the compensated mover-mover bound at refresh time, so
    they must stay inside it.

    ``comm`` (avbd3d_tpu.comm): collective seam for a body-sharded world.
    The reuse predicate is built from all-reduces so every shard takes the
    same lax.cond branch; defaults to the no-op LocalComm."""
    if comm is None:
        from ..comm import LOCAL_COMM as comm
    pos_cg, dynamic_g = b.pos, b.dynamic
    disp = [pos_cg[k] - bp.anchor[k] for k in range(3)]
    disp2 = sum(d * d for d in disp)
    moved = dynamic_g | (disp2 > 0.0)
    chord = _rot_chord(b.quat, bp.anchor_quat, b.radius)
    mf = moved.astype(jnp.float32)
    nm = jnp.maximum(comm.psum(jnp.sum(mf)), 1.0)
    t = [comm.psum(jnp.sum(d * mf)) / nm for d in disp]
    dev = jnp.sqrt(sum((disp[k] - t[k]) ** 2 for k in range(3))) + chord
    need_mm = comm.pmax(jnp.max(jnp.where(moved, dev, 0.0))) > 0.5 * margin
    raw = jnp.sqrt(disp2) + chord
    need_ms = comm.pmax(jnp.max(jnp.where(moved, raw, 0.0))) > bp.slack + margin
    need = need_mm | need_ms

    def rebuild(_):
        return build_bp_cache(b, exclusions, degree, margin, comm=comm,
                              window=window)

    return lax.cond(need, rebuild, lambda _: bp, operand=None)


def build_bp_cache(b, exclusions, degree: int, margin: float,
                   comm=None, window: int = 0) -> BroadphaseCache:
    """Fresh candidate lists anchored at the current poses.  ``window`` > 0
    selects the guarded sub-quadratic sweep (``candidate_lists_swept``) on
    single-shard worlds; 0 = the row-blocked O(N²) matrix."""
    if comm is None:
        from ..comm import LOCAL_COMM as comm
    half = tuple(b.size[k] * 0.5 for k in range(3))
    if window > 0 and comm.n_shards == 1:
        nb, key, thr, cand, slack = candidate_lists_swept(
            b.pos, b.quat, half, b.radius, b.dynamic, exclusions, degree,
            margin, window, comm=comm,
        )
    else:
        nb, key, thr, cand, slack = candidate_lists(
            b.pos, b.quat, half, b.radius, b.dynamic, exclusions, degree,
            margin, comm=comm,
        )
    dropped = cand - comm.psum(jnp.sum((nb >= 0).astype(jnp.int32)))
    return BroadphaseCache(anchor=b.pos, anchor_quat=b.quat, nb=nb,
                           key=key, thr=thr, cand=cand, slack=slack,
                           dropped=dropped)


def refresh_scalar(bp: BroadphaseCache, diag_vec, b, exclusions, degree: int,
                   margin: float, comm=None, window: int = 0):
    """Scalar-gated refresh: the reuse predicate reads the anchor-deviation
    scalars the previous step's backend kernel computed on its final poses
    (Diagnostics lanes 14/15 — the same two bounds ``refresh_or_reuse``
    derives by reduction, see ``control_lanes``), so the per-step cost is
    two scalar compares.  Returns (cache, refreshed bool)."""
    need = (diag_vec[14] > 0.5 * margin) | (diag_vec[15] > bp.slack + margin)

    def rebuild(_):
        return build_bp_cache(b, exclusions, degree, margin, comm=comm,
                              window=window)

    return lax.cond(need, rebuild, lambda _: bp, operand=None), need


def candidate_lists(pos_cg, quat_cg, half_cg, radius_g, dynamic_g,
                    exclusions, degree: int, margin: float = 0.0,
                    block_rows: int = 2048, comm=None):
    """Per-body candidate slots, nearest-first, as unique integer keys.

    pos_cg (3, G, 128), quat_cg (4, G, 128), half_cg 3-tuple of (G, 128)
    box half-extents, radius_g/dynamic_g (G, 128); exclusions (E, G, 128)
    partner indices or -1.  Returns:
      nb        (D, G, 128) int32 partner index (-1 empty)
      key       (D, G, 128) int32 the slot's selection key (q * N + partner)
      thr       (G, 128)    int32 largest key this body kept (INT32_MAX if
                            the body kept every overlapping candidate)
      candidate_slots       int32 total directed overlap slots pre-capacity
      slack     ()          f32 smallest POSITIVE gap from any dynamic body
                            to any static body (1e9 when none: every static
                            body is already a candidate of every dynamic
                            one) — the mover-static reuse bound

    ``comm``: when the world is body-sharded over a mesh, the inputs are
    this shard's (G_loc, 128) rows; the COLUMN side is all-gathered to the
    global body set, row indices are offset to global ids, and the scalar
    outputs are all-reduced — each shard computes exactly the row block a
    single device would (the row-blocked path below IS the per-device
    decomposition).  nb/key/thr stay per-shard rows.
    """
    if comm is None:
        from ..comm import LOCAL_COMM as comm
    g = radius_g.shape[0]
    n_rows = g * 128
    row0_base = comm.row0(n_rows)
    n = n_rows * comm.n_shards
    # World AABB half-extents (the box projected onto the world axes).
    wh_cg = world_halves(tuple(quat_cg[k] for k in range(4)), half_cg)
    px = comm.all_gather_g(pos_cg[0]).reshape(n)
    py = comm.all_gather_g(pos_cg[1]).reshape(n)
    pz = comm.all_gather_g(pos_cg[2]).reshape(n)
    wh = [comm.all_gather_g(wh_cg[k]).reshape(n) for k in range(3)]
    radius = comm.all_gather_g(radius_g).reshape(n)
    dynamic = comm.all_gather_g(dynamic_g).reshape(n)
    excl = exclusions.reshape(exclusions.shape[0], n_rows) if exclusions.shape[0] else None
    # Local row views (identical to the globals when unsharded).
    px_r = pos_cg[0].reshape(n_rows)
    py_r = pos_cg[1].reshape(n_rows)
    pz_r = pos_cg[2].reshape(n_rows)
    wh_r = [wh_cg[k].reshape(n_rows) for k in range(3)]
    radius_r = radius_g.reshape(n_rows)
    dynamic_r = dynamic_g.reshape(n_rows)
    # Key packing constants are GLOBAL so row-blocked and whole-matrix
    # evaluation produce identical keys (see below).
    q_max = (2**31 - 1) // n - 1
    max_wh = jnp.maximum(jnp.maximum(jnp.max(wh[0]), jnp.max(wh[1])),
                         jnp.max(wh[2]))
    gap_range = jnp.maximum(2.0 * max_wh + margin, 1e-6)

    def row_block(r0, nb_rows: int):
        """Candidate selection for LOCAL rows [r0, r0+nb_rows) against all
        N global columns: all intermediates are (nb_rows, N), never (N, N)
        — at N=16384 the full matrix tier would materialize several 1 GB
        arrays per refresh."""
        pxb = lax.dynamic_slice_in_dim(px_r, r0, nb_rows)
        pyb = lax.dynamic_slice_in_dim(py_r, r0, nb_rows)
        pzb = lax.dynamic_slice_in_dim(pz_r, r0, nb_rows)
        whb = [lax.dynamic_slice_in_dim(wh_r[k], r0, nb_rows) for k in range(3)]
        rb = lax.dynamic_slice_in_dim(radius_r, r0, nb_rows)
        dynb = lax.dynamic_slice_in_dim(dynamic_r, r0, nb_rows)
        rsum = rb[:, None] + radius[None, :] + margin
        # Global row ids.  row0_base is the Python int 0 off the sharded
        # path — keep the add out of the jaxpr there so single-device
        # compile-cache keys are unchanged by the comm seam.
        r0g = r0 if isinstance(row0_base, int) and row0_base == 0 else row0_base + r0
        ii = r0g + lax.broadcasted_iota(jnp.int32, (nb_rows, n), 0)
        jj = lax.broadcasted_iota(jnp.int32, (nb_rows, n), 1)
        # Rank candidates by the Chebyshev AABB surface gap
        # max_k(|d_k| - (whA_k + whB_k)) — NOT center distance: a huge
        # static slab's center is "far" from every body even while touching
        # it, and center-ranked eviction under a transient overflow would
        # drop the ground contact first — bodies then tunnel through the
        # floor (observed on Stress1000 landing cascades).  Gap ranking
        # keeps the most-overlapping pairs, so capacity eviction can only
        # ever drop the least-engaged margin candidates.  The AABB gap is a
        # lower bound on true box distance (each axis separates), so
        # gap > 0.02 also proves SAT's persistence test fails — the same
        # soundness the sphere gap gave, at ~half the realized degree.
        gap = jnp.maximum(
            jnp.maximum(
                jnp.abs(pxb[:, None] - px[None, :]) - (whb[0][:, None] + wh[0][None, :]),
                jnp.abs(pyb[:, None] - py[None, :]) - (whb[1][:, None] + wh[1][None, :]),
            ),
            jnp.abs(pzb[:, None] - pz[None, :]) - (whb[2][:, None] + wh[2][None, :]),
        ) - margin
        # rsum > margin rejects padding bodies (sentinel negative radius).
        mask = (gap <= 0.0) & (rsum > margin) & (ii != jj) & dynb[:, None]

        # isConstrainedTo exclusions BEFORE slot selection
        # (rigid.cpp:61-69): an excluded partner never occupies a slot.
        if excl is not None:
            for e in range(excl.shape[0]):
                eb = lax.dynamic_slice_in_dim(excl[e], r0, nb_rows)
                mask &= jj != eb[:, None]

        cand_b = jnp.sum(mask.astype(jnp.int32))

        # Pack (gap, partner) into one strictly-increasing int32 key: q in
        # [0, q_max) quantizes the gap over [-2*max_r, 0] (selection-only
        # resolution ~1e-6 of the range).  Unique keys make deepest-first
        # selection and the symmetric threshold test exact integer logic
        # with no float-tie ambiguity.  The gap expression is bit-exact
        # symmetric (d2 and rsum both are), so both endpoints quantize
        # identically.
        qq = jnp.clip(
            (gap + gap_range) * (q_max / gap_range), 0.0, float(q_max)
        ).astype(jnp.int32)
        key = qq * n + jj

        score = jnp.where(mask, -key, INT32_MIN)
        vals, nb = lax.top_k(score, degree)        # (nb_rows, D) deepest 1st
        valid = vals > INT32_MIN
        nb = jnp.where(valid, nb, -1)
        key_slot = jnp.where(valid, -vals, 0)
        last = vals[:, degree - 1]
        thr = jnp.where(last > INT32_MIN, -last, INT32_MAX)

        # Mover-static slack: the closest any dynamic body comes (at these
        # anchor poses) to a static body it is NOT a candidate of.
        slack_mask = (
            dynb[:, None] & ~dynamic[None, :] & (rsum > margin)
            & (gap > 0.0) & (ii != jj)
        )
        slack_b = jnp.min(jnp.where(slack_mask, gap, 1.0e9))
        return nb, key_slot, thr, cand_b, slack_b

    if n_rows <= block_rows:
        nb, key_slot, thr, candidate_slots, slack = row_block(0, n_rows)
    else:
        # Largest row-block that divides the local row count and stays
        # <= block_rows rows (row counts are multiples of 128, so 128
        # always divides).
        block = 128 * max(
            bg for bg in range(1, block_rows // 128 + 1) if g % bg == 0
        )
        r0s = jnp.arange(0, n_rows, block, dtype=jnp.int32)
        nb_s, key_s, thr_s, cand_s, slack_s = lax.map(
            lambda r0: row_block(r0, block), r0s
        )
        nb = nb_s.reshape(n_rows, degree)
        key_slot = key_s.reshape(n_rows, degree)
        thr = thr_s.reshape(n_rows)
        candidate_slots = jnp.sum(cand_s)
        slack = jnp.min(slack_s)

    return (
        nb.T.reshape(degree, g, 128),
        key_slot.T.reshape(degree, g, 128),
        thr.reshape(g, 128),
        comm.psum(candidate_slots),
        comm.pmin(slack),
    )


def candidate_lists_swept(pos_cg, quat_cg, half_cg, radius_g, dynamic_g,
                          exclusions, degree: int, margin: float,
                          window: int, n_fat: int = 8, comm=None):
    """Sub-quadratic candidate selection: sorted-axis sweep over chunked
    column windows, exactness-guarded (SURVEY §2#4; replaces the
    reference's O(n²) loop, solver.cpp:261-270, with the scaling the north
    star mandates).

    Same outputs as ``candidate_lists`` (the slots, keys, and threshold
    feeding ``symmetric_filter`` are untouched downstream):

    1. Bodies are sorted by their world-AABB minimum along the axis with
       the largest center spread; rows are processed in chunks of 128
       sorted rows, each against ONE contiguous STATIC column window of
       ``window`` sorted columns centered on the chunk.  A pair
       overlapping on the sweep axis satisfies ``xmin_chunk - 2*e_slim -
       margin <= xmin_j <= xmax_chunk + margin``; two value compares at
       the window's static edge indices prove the window contains that
       whole range (else the guard fires).  Both the (128, window) mask
       work and — decisive on this chip — the ``top_k`` column width drop
       from N to ``window``.  Measured N=1024 pathologies that shaped
       this form: top_k is ~200 us of the 254 us matrix refresh and
       scales with column width (512-wide: 80 us) BUT wants 128-aligned
       widths (pick window + n_fat divisible by 128); a 2W-roll band
       construction was 4.6x SLOWER than the matrix; per-chunk scalar
       ``searchsorted`` placement costs 384 us and traced-offset
       dynamic_slice 4x a static slice — hence static centered windows
       and value-compare guards; ``take_along_axis`` partner extraction
       costs 269 us — hence partners decode from the selected keys as
       ``key % n``.
    2. The ``n_fat`` largest-sweep-extent real bodies (the ground slab:
       its AABB spans the scene, which would force window = N) are pulled
       out of the sweep and tested against every chunk as dense overlay
       columns.
    3. An exactness guard falls back to the full O(N²) row-blocked path
       (one lax.cond) whenever the window could provably miss a pair:
       some chunk's required column range exceeds ``window``, or a fat
       body is dynamic (fat rows only get fat partners from the overlay).
       The swept result is therefore always IDENTICAL to the matrix path
       (modulo ±1 gap-quantization ulps from differing XLA codegen — the
       same tolerance as the row-blocked equivalence,
       tests/test_grid_backend.py), never an approximation.

    ``slack`` is conservative: out-of-window pairs contribute their sorted
    axis-gap lower bound whenever any sweep-resident static body exists
    (extra refreshes at worst, never a missed one).  Single-shard only —
    sharded worlds keep the row-blocked matrix path.
    """
    if comm is None:
        from ..comm import LOCAL_COMM as comm
    assert comm.n_shards == 1, "swept broadphase is single-shard"
    g = radius_g.shape[0]
    n = g * 128
    cw = int(window)
    assert 0 < cw <= n and cw + n_fat >= degree
    wh_cg = world_halves(tuple(quat_cg[k] for k in range(4)), half_cg)
    c = [pos_cg[k].reshape(n) for k in range(3)]
    wh = [wh_cg[k].reshape(n) for k in range(3)]
    radius = radius_g.reshape(n)
    dyn = dynamic_g.reshape(n)
    real = radius > 0.0
    excl = (exclusions.reshape(exclusions.shape[0], n)
            if exclusions.shape[0] else None)
    n_e = excl.shape[0] if excl is not None else 0

    # Key packing identical to candidate_lists (global constants).
    q_max = (2**31 - 1) // n - 1
    max_wh = jnp.maximum(jnp.maximum(jnp.max(wh[0]), jnp.max(wh[1])),
                         jnp.max(wh[2]))
    gap_range = jnp.maximum(2.0 * max_wh + margin, 1e-6)

    def quant(gap):
        return jnp.clip(
            (gap + gap_range) * (q_max / gap_range), 0.0, float(q_max)
        ).astype(jnp.int32)

    # Sweep axis: the largest real-body center spread.
    big = jnp.float32(1.0e30)
    spread = jnp.stack([
        jnp.max(jnp.where(real, c[k], -big)) - jnp.min(jnp.where(real, c[k], big))
        for k in range(3)
    ])
    ax = jnp.argmax(spread)
    c_ax = jnp.where(ax == 0, c[0], jnp.where(ax == 1, c[1], c[2]))
    wh_ax = jnp.where(ax == 0, wh[0], jnp.where(ax == 1, wh[1], wh[2]))

    # Fat overlay: up to n_fat GENUINELY fat real bodies.  Membership is
    # thresholded, not just top-k: in a uniform scene the top-8-by-extent
    # set is the ground slab plus 7 perfectly ordinary (dynamic!) cubes,
    # and those false fats made ``fat_dyn`` fire the fallback on EVERY
    # call — the round-5 roll-based sweep shipped with exactly that bug
    # and measured 4.6x slower than the matrix because it always paid
    # sweep + matrix.  A top-k body stays fat only when its sweep extent
    # exceeds 4x the largest remaining (slim) extent; demotion is safe —
    # the window-coverage guard still proves exactness either way.
    ext = jnp.where(real, wh_ax, -big)
    fe, fat_idx_w = lax.top_k(ext, n_fat + 1)
    e_rest = fe[n_fat]
    fat_idx = fat_idx_w[:n_fat]
    fat_keep = fe[:n_fat] > 4.0 * jnp.maximum(e_rest, 1e-6)
    is_fat = jnp.zeros((n,), bool).at[fat_idx].set(fat_keep) & real
    slim = real & ~is_fat
    e_slim = jnp.max(jnp.where(slim, wh_ax, 0.0))

    # Sort: slim real by axis AABB min; fat then padding forced to the tail
    # (index as the tie-break key keeps the order total and deterministic).
    xmin = c_ax - wh_ax
    iota = lax.iota(jnp.int32, n)
    primary = jnp.where(~real, 2.0 * big, jnp.where(is_fat, big, xmin))
    payload = [c[0], c[1], c[2], wh[0], wh[1], wh[2], radius,
               dyn.astype(jnp.int32), wh_ax]
    if excl is not None:
        payload += [excl[e] for e in range(n_e)]
    sorted_ops = lax.sort((primary, iota) + tuple(payload), dimension=0,
                          num_keys=2)
    xmin_s = sorted_ops[0]  # the sort key: xmin for slim, big/2*big for tail
    orig_s = sorted_ops[1]
    cx_s, cy_s, cz_s, w0_s, w1_s, w2_s, rad_s, dynf_s, whax_s = sorted_ops[2:11]
    excl_s = sorted_ops[11:11 + n_e]
    dyn_s = dynf_s > 0
    n_slim = n - jnp.sum((is_fat | ~real).astype(jnp.int32))

    # Fat bodies' payload (n_fat tiny gathers).
    fat_c = [c[k][fat_idx] for k in range(3)]
    fat_wh = [wh[k][fat_idx] for k in range(3)]
    fat_rad = radius[fat_idx]
    fat_dyn_v = dyn[fat_idx]
    # Demoted top-k members ride the sweep as slim bodies — masking them
    # out of the overlay prevents double-counted pairs.
    fat_real = real[fat_idx] & fat_keep

    def cheb_gap(rc, rw, pc, pw):
        """(rows, cols) Chebyshev AABB gap - margin; rc/rw (3, R), pc/pw
        (3, C).  Identical expression to candidate_lists.row_block."""
        return jnp.maximum(
            jnp.maximum(
                jnp.abs(rc[0][:, None] - pc[0][None, :]) - (rw[0][:, None] + pw[0][None, :]),
                jnp.abs(rc[1][:, None] - pc[1][None, :]) - (rw[1][:, None] + pw[1][None, :]),
            ),
            jnp.abs(rc[2][:, None] - pc[2][None, :]) - (rw[2][:, None] + pw[2][None, :]),
        ) - margin

    score_rows = []
    cand = jnp.int32(0)
    slack = jnp.float32(1.0e9)
    slack_bound = jnp.float32(1.0e9)
    guard_bad = jnp.bool_(False)

    def srow(a, r0):
        return lax.slice_in_dim(a, r0, r0 + 128)

    for t in range(n // 128):
        r0 = t * 128
        row_c = tuple(srow(cs, r0) for cs in (cx_s, cy_s, cz_s))
        row_w = tuple(srow(ws, r0) for ws in (w0_s, w1_s, w2_s))
        row_rad = srow(rad_s, r0)
        row_dyn = srow(dyn_s, r0)
        row_orig = srow(orig_s, r0)
        row_xmin = srow(xmin_s, r0)
        row_whax = srow(whax_s, r0)
        row_excl = [srow(excl_s[e], r0) for e in range(n_e)]
        row_pos = r0 + lax.iota(jnp.int32, 128)
        # Window bounds come from the chunk's DYNAMIC slim rows (static
        # rows own no slots, fat/padding rows produce nothing here).
        need = (row_pos < n_slim) & row_dyn
        has_rows = jnp.any(need)
        chunk_min = jnp.min(jnp.where(need, row_xmin, big))
        chunk_xmax = jnp.max(jnp.where(need, row_xmin + 2.0 * row_whax, -big))

        # STATIC centered window: [start, start+cw) with start a Python
        # int, so every column read below is a static slice and the edge
        # probes are static scalar reads.
        start = min(max(r0 + 64 - cw // 2, 0), n - cw)
        # Coverage guard: every overlap-capable column's xmin lies in
        # [chunk_min - 2*e_slim - margin, chunk_xmax + margin]; the window
        # covers that range iff its left edge value is strictly below the
        # low bound (or the window starts at 0) and its right edge value
        # strictly above the high bound (or the window ends at n).
        left_ok = (start == 0) or (
            xmin_s[start] < chunk_min - 2.0 * e_slim - margin
        )
        right_ok = (start + cw >= n) or (xmin_s[start + cw] > chunk_xmax + margin)
        if not (left_ok is True and right_ok is True):
            ok = jnp.logical_and(left_ok, right_ok)
            guard_bad |= has_rows & jnp.logical_not(ok)

        def scol(a, start=start):
            return lax.slice_in_dim(a, start, start + cw)

        col_c = (scol(cx_s), scol(cy_s), scol(cz_s))
        col_w = (scol(w0_s), scol(w1_s), scol(w2_s))
        col_rad = scol(rad_s)
        col_dyn = scol(dynf_s) > 0
        col_orig = scol(orig_s)
        col_slim = (start + lax.iota(jnp.int32, cw)) < n_slim

        gap = cheb_gap(row_c, row_w, col_c, col_w)           # (128, cw)
        rsum = row_rad[:, None] + col_rad[None, :] + margin
        mask = (
            (gap <= 0.0) & (rsum > margin) & row_dyn[:, None]
            & (row_orig[:, None] != col_orig[None, :]) & col_slim[None, :]
        )
        for e in range(n_e):
            mask &= col_orig[None, :] != row_excl[e][:, None]
        key = quant(gap) * n + col_orig[None, :]
        score = jnp.where(mask, -key, INT32_MIN)

        # Fat overlay columns (128, n_fat).
        gap_f = cheb_gap(row_c, row_w, tuple(fat_c), tuple(fat_wh))
        rsum_f = row_rad[:, None] + fat_rad[None, :] + margin
        mask_f = (
            (gap_f <= 0.0) & (rsum_f > margin) & row_dyn[:, None]
            & (row_orig[:, None] != fat_idx[None, :]) & fat_real[None, :]
        )
        for e in range(n_e):
            mask_f &= fat_idx[None, :] != row_excl[e][:, None]
        key_f = quant(gap_f) * n + fat_idx[None, :]
        score_f = jnp.where(mask_f, -key_f, INT32_MIN)

        # Scores are stacked across chunks and ranked by ONE top_k call
        # below: at this shape top_k has a ~15 us per-call fixed cost, so
        # 8 per-chunk calls cost ~2.5x one (n, cw + n_fat) call (measured).
        score_rows.append(jnp.concatenate([score, score_f], axis=1))
        cand += (jnp.sum(mask.astype(jnp.int32))
                 + jnp.sum(mask_f.astype(jnp.int32)))

        # Mover-static slack: in-window and fat static columns exactly ...
        sm = (
            row_dyn[:, None] & ~col_dyn[None, :] & col_slim[None, :]
            & (rsum > margin) & (gap > 0.0)
            & (row_orig[:, None] != col_orig[None, :])
        )
        slack = jnp.minimum(slack, jnp.min(jnp.where(sm, gap, 1.0e9)))
        sm_f = (
            row_dyn[:, None] & ~fat_dyn_v[None, :] & fat_real[None, :]
            & (rsum_f > margin) & (gap_f > 0.0)
            & (row_orig[:, None] != fat_idx[None, :])
        )
        slack = jnp.minimum(slack, jnp.min(jnp.where(sm_f, gap_f, 1.0e9)))
        # ... plus axis-gap lower bounds for slim columns outside the
        # window (before: xmax_j <= xmin_s[start-1] + 2*e_slim; beyond:
        # xmin_j >= xmin_s[start+cw]) — static edge reads again.
        before = (
            chunk_min - (xmin_s[start - 1] + 2.0 * e_slim) - margin
            if start > 0 else jnp.float32(1.0e9)
        )
        beyond = (
            xmin_s[start + cw] - chunk_xmax - margin
            if start + cw < n else jnp.float32(1.0e9)
        )
        slack_bound = jnp.minimum(slack_bound, jnp.minimum(before, beyond))

    slim_static = jnp.any(slim & ~dyn)
    slack = jnp.where(slim_static, jnp.minimum(slack, slack_bound), slack)
    fat_dyn = jnp.any(is_fat & dyn)
    need_fallback = guard_bad | fat_dyn

    # ---- one ranked selection over all chunks ----
    score_all = jnp.concatenate(score_rows, axis=0)  # (n, cw + n_fat)
    vals, _sel = lax.top_k(score_all, degree)
    valid = vals > INT32_MIN
    key_s = jnp.where(valid, -vals, 0)
    # Keys are q * n + partner with partner in [0, n): the partner id
    # decodes from the key itself — a take_along_axis gather here costs
    # 269 us at this shape (measured), the modulo is free.
    nb_s = jnp.where(valid, key_s % n, -1)
    last = vals[:, degree - 1]
    thr_s = jnp.where(last > INT32_MIN, -last, INT32_MAX)

    # ---- un-sort rows to body order ----
    orig_b = jnp.broadcast_to(orig_s[:, None], (n, degree))
    _o, nb_u, key_u = lax.sort((orig_b, nb_s, key_s), dimension=0, num_keys=1)
    _o1, thr_u = lax.sort((orig_s, thr_s), dimension=0, num_keys=1)

    swept = (
        nb_u.T.reshape(degree, g, 128),
        key_u.T.reshape(degree, g, 128),
        thr_u.reshape(g, 128),
        cand,
        slack,
    )

    def fallback(_):
        return candidate_lists(
            pos_cg, quat_cg, half_cg, radius_g, dynamic_g, exclusions,
            degree, margin,
        )

    return lax.cond(need_fallback, fallback, lambda _: swept, operand=None)


def symmetric_filter(nb, key, thr, dynamic_g, gather, own_iota=None, n_total=None):
    """Drop directed slots whose dynamic partner did not keep the pair.

    All operands component-major: nb/key (D, G, 128), thr/dynamic_g
    (G, 128).  ``gather(table_g128, idx_dg128)`` is the backend's gather
    strategy (xla_gather on the portable path, select_gather inside Mosaic).
    The grid backend passes blocked nb/key with full thr/dynamic tables plus
    ``own_iota`` (global indices of the block's bodies) and ``n_total``.
    Returns (filtered nb, kept directed-slot count).
    """
    d, g, _ = nb.shape
    n = n_total if n_total is not None else g * 128
    valid = nb >= 0
    idx = jnp.where(valid, nb, 0)
    if own_iota is None:
        own = (
            lax.broadcasted_iota(jnp.int32, (d, g, 128), 1) * 128
            + lax.broadcasted_iota(jnp.int32, (d, g, 128), 2)
        )
    else:
        own = jnp.broadcast_to(own_iota[None], (d, g, 128))
    # My key in the partner's row: same quantized distance digit (d2 is
    # bit-symmetric, so the quantization matches exactly), my index as the
    # tie-break digit.
    q = key // n
    key_rev = q * n + own
    thr_p = gather(thr, idx)
    partner_kept_me = key_rev <= thr_p
    partner_static = gather(dynamic_g.astype(jnp.float32), idx) < 0.5
    keep = valid & (partner_kept_me | partner_static)
    nb = jnp.where(keep, nb, -1)
    kept = jnp.sum(keep.astype(jnp.int32))
    return nb, kept


def bp_probe(nb, pos_cg, quat_cg, half_cg, radius_g, linvel_cg, angvel_cg,
             dt: float, collision_margin: float, grav_len: float, gather):
    """Probe the cached candidate slots at CURRENT poses.  Returns:

      min_sep  () f32   min over valid slots of the pair's BEST face-axis
                        SAT separation (1e9 when no slots).  The SAT
                        early-outs whenever any of the 6 face axes shows
                        separation > collision_margin (testAxis,
                        collision.cpp:231-234; narrowphase_cm mirrors it),
                        and contacts can only arise from candidate slots —
                        so ``min_sep > collision_margin`` PROVES narrowphase
                        at these poses yields zero contacts (the ballistic
                        fast-path predicate).  NOTE: bounding-sphere gaps
                        are useless here — a ground slab's sphere encloses
                        the whole scene — hence the face-axis projections.
      n_slots  () int32 number of valid candidate slots (== cache.cand iff
                        no top_k capacity drop happened at refresh — a
                        second ballistic requirement, since dropped slots
                        are unprobed).
      near     (G,128) bool  body could gain a contact row THIS step: some
                        slot's best separation minus one step of worst-case
                        mutual surface travel is within collision_margin.
                        Scopes the stale-Hessian speed gate to bodies whose
                        Hessian can actually contain contact rows.

    Pure math — runs with xla_gather on CPU and select_gather inside the
    Mosaic probe kernel (solver_tpu.bp_probe_tpu)."""
    from .. import cm

    valid = nb >= 0
    idx = jnp.where(valid, nb, 0)
    pp = [gather(pos_cg[k], idx) for k in range(3)]
    pq = [gather(quat_cg[k], idx) for k in range(4)]
    ph = [gather(half_cg[k], idx) for k in range(3)]
    delta = [pp[k] - pos_cg[k][None] for k in range(3)]
    # Own axes/halves broadcast (1, G, 128) against partner slots (D, G, 128).
    own_ax = [[c[None] for c in ax] for ax in cm.q_axes(tuple(quat_cg))]
    own_half = [h[None] for h in half_cg]
    par_ax = [list(ax) for ax in cm.q_axes(tuple(pq))]

    def proj(axes, half, n_vec):
        """Projection radius of a box (3 axes, 3 half-extents) onto axis n."""
        return sum(
            half[k] * jnp.abs(
                axes[k][0] * n_vec[0] + axes[k][1] * n_vec[1]
                + axes[k][2] * n_vec[2]
            )
            for k in range(3)
        )

    best = jnp.full(nb.shape, -1.0e9, jnp.float32)
    for n_vec in [own_ax[a] for a in range(3)] + [par_ax[a] for a in range(3)]:
        sep = (
            jnp.abs(sum(delta[i] * n_vec[i] for i in range(3)))
            - proj(own_ax, own_half, n_vec)
            - proj(par_ax, ph, n_vec)
        )
        best = jnp.maximum(best, sep)
    min_sep = jnp.min(jnp.where(valid, best, 1.0e9))
    n_slots = jnp.sum(valid.astype(jnp.int32))

    speed = jnp.sqrt(sum(c * c for c in linvel_cg))
    wspin = jnp.sqrt(sum(c * c for c in angvel_cg)) * jnp.maximum(radius_g, 0.0)
    travel = (speed + wspin) * dt
    reach = travel[None] + gather(travel, idx) + 4.0 * dt * dt * grav_len
    near = jnp.any(valid & (best - reach <= collision_margin), axis=0)
    return min_sep, n_slots, near


def control_lanes(nb, pos_cg, quat_cg, half_cg, radius_g, linvel_cg,
                  angvel_cg, dynamic_g, anchor, anchor_quat, params,
                  gather, comm=None):
    """The step-control scalars (Diagnostics lanes 11-15), evaluated on
    END-of-step state so the next step's gates are scalar logic.

    Returns a 5-tuple (gate_speed_sq, near_speed_sq, min_cand_gap,
    bp_dev_mm, bp_dev_raw) — see state.Diagnostics for semantics.  The gap
    test uses the world-AABB surface gap: a true lower bound on box
    distance (every axis separates), so ``min_cand_gap > collision_margin``
    proves SAT's persistence test fails for every candidate pair — the
    exact ballistic-step predicate (narrowphase at these poses yields zero
    contacts; contacts only arise from candidate slots).  Runs as plain
    jnp inside the Mosaic step kernel (select_gather) and as XLA on the
    portable path (xla_gather); ``comm`` all-reduces for a body-sharded
    world."""
    if comm is None:
        from ..comm import LOCAL_COMM as comm
    valid = nb >= 0
    idx = jnp.where(valid, nb, 0)

    # World-AABB gap per candidate slot at the current poses.
    wh = world_halves(tuple(quat_cg), tuple(half_cg))
    pwh = [gather(wh[k], idx) for k in range(3)]
    ppos = [gather(pos_cg[k], idx) for k in range(3)]
    gap = jnp.maximum(
        jnp.maximum(
            jnp.abs(ppos[0] - pos_cg[0][None]) - (wh[0][None] + pwh[0]),
            jnp.abs(ppos[1] - pos_cg[1][None]) - (wh[1][None] + pwh[1]),
        ),
        jnp.abs(ppos[2] - pos_cg[2][None]) - (wh[2][None] + pwh[2]),
    )
    min_gap = comm.pmin(jnp.min(jnp.where(valid, gap, 1.0e9)))

    # Near mask: body could gain a contact row next step (worst-case mutual
    # surface travel closes the gap to within the collision margin).
    g_len = float(sum(x * x for x in params.gravity) ** 0.5)
    speed_sq = sum(c * c for c in linvel_cg)
    speed = jnp.sqrt(speed_sq)
    wspin = jnp.sqrt(sum(c * c for c in angvel_cg)) * jnp.maximum(radius_g, 0.0)
    travel = (speed + wspin) * params.dt
    reach = travel[None] + gather(travel, idx) + 4.0 * params.dt**2 * g_len
    near = jnp.any(valid & (gap - reach <= params.collision_margin), axis=0)

    # Speed gates exclude bodies the fall-freeze pre-pass will make static
    # before the next solve (solver.step), so both backends' gates see the
    # same post-freeze speeds.
    alive = dynamic_g
    if params.fall_freeze_y > -1.0e8:
        alive = alive & (pos_cg[1] >= params.fall_freeze_y)
    v2 = jnp.where(alive, speed_sq, 0.0)
    gate_speed_sq = comm.pmax(jnp.max(v2))
    near_speed_sq = comm.pmax(jnp.max(jnp.where(near, v2, 0.0)))

    # Broadphase-anchor deviation bounds (refresh_or_reuse's predicate,
    # evaluated one step early on the same state).
    disp = [pos_cg[k] - anchor[k] for k in range(3)]
    disp2 = sum(d * d for d in disp)
    moved = dynamic_g | (disp2 > 0.0)
    chord = _rot_chord(tuple(quat_cg), tuple(anchor_quat), radius_g)
    mf = moved.astype(jnp.float32)
    nm = jnp.maximum(comm.psum(jnp.sum(mf)), 1.0)
    t = [comm.psum(jnp.sum(d * mf)) / nm for d in disp]
    dev = jnp.sqrt(sum((disp[k] - t[k]) ** 2 for k in range(3))) + chord
    dev_mm = comm.pmax(jnp.max(jnp.where(moved, dev, 0.0)))
    dev_raw = comm.pmax(jnp.max(jnp.where(moved, jnp.sqrt(disp2) + chord, 0.0)))
    return gate_speed_sq, near_speed_sq, min_gap, dev_mm, dev_raw


def neighbor_lists(pos_cg, quat_cg, half_cg, radius_g, dynamic_g,
                   exclusions, degree: int):
    """Portable one-call broadphase: candidates + symmetric filter (native
    gather).  Returns (neighbors (D, G, 128) int32 with -1 empty, overflow =
    dropped directed slots)."""

    def xla_gather(table, idx):
        return table.reshape(-1)[idx.reshape(-1)].reshape(idx.shape)

    nb, key, thr, candidate_slots, _slack = candidate_lists(
        pos_cg, quat_cg, half_cg, radius_g, dynamic_g, exclusions, degree
    )
    nb, kept = symmetric_filter(nb, key, thr, dynamic_g, xla_gather)
    return nb, candidate_slots - kept
