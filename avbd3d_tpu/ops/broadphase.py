"""Broadphase: all-pairs bounding-sphere culling to per-body neighbor lists.

The reference broadphase is an O(n^2) double loop over linked lists that
allocates a ``Manifold`` per overlapping pair (solver.cpp:261-270) and skips
pairs already linked by any force via ``isConstrainedTo`` (rigid.cpp:61-69).

TPU rebuild, in two stages:

1. ``candidate_lists`` (XLA): one (N, N) masked tensor op + per-row
   ``top_k`` compacts each body's overlapping partners into D static
   neighbor slots, deepest-gap-first.  Distances are packed into strictly unique
   int32 keys ``quantized_d2 * N + partner`` so selection is exactly
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


def _pytree(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree
@dataclasses.dataclass(frozen=True)
class BroadphaseCache:
    """Candidate lists + the body positions they were computed at.

    Candidate selection is run with the sphere radii enlarged by
    ``params.bp_margin``; the lists then remain an exact superset of all
    truly-overlapping pairs until some body has moved more than margin/2
    from its anchor — so in slow regimes (a settled pile) the O(N^2) + top_k
    stage amortizes to near zero while narrowphase always sees fresh
    positions.  The whole bundle refreshes atomically, keeping the
    symmetric-filter threshold test consistent."""

    anchor: Any   # (3, G, 128) positions at last refresh
    nb: Any       # (D, G, 128) int32 candidate partner (-1 empty)
    key: Any      # (D, G, 128) int32 selection keys
    thr: Any      # (G, 128) int32 largest key each body kept
    cand: Any     # () int32 directed candidate-slot count at refresh

    def replace(self, **kw) -> "BroadphaseCache":
        return dataclasses.replace(self, **kw)


def empty_bp_cache(n_groups: int, degree: int) -> BroadphaseCache:
    g = n_groups
    return BroadphaseCache(
        anchor=jnp.full((3, g, 128), 1.0e9, jnp.float32),  # forces refresh
        nb=jnp.full((degree, g, 128), -1, jnp.int32),
        key=jnp.zeros((degree, g, 128), jnp.int32),
        thr=jnp.zeros((g, 128), jnp.int32),
        cand=jnp.int32(0),
    )


def refresh_or_reuse(bp: BroadphaseCache, pos_cg, radius_g, dynamic_g,
                     exclusions, degree: int, margin: float) -> BroadphaseCache:
    """Rebuild the candidate lists only when some body moved > margin/2
    since the cached anchor (exactness argument in BroadphaseCache)."""
    disp2 = sum((pos_cg[k] - bp.anchor[k]) ** 2 for k in range(3))
    need = jnp.max(disp2) > (0.5 * margin) ** 2

    def rebuild(_):
        nb, key, thr, cand = candidate_lists(
            pos_cg, radius_g, dynamic_g, exclusions, degree, margin
        )
        return BroadphaseCache(anchor=pos_cg, nb=nb, key=key, thr=thr, cand=cand)

    return lax.cond(need, rebuild, lambda _: bp, operand=None)


def candidate_lists(pos_cg, radius_g, dynamic_g, exclusions, degree: int,
                    margin: float = 0.0):
    """Per-body candidate slots, nearest-first, as unique integer keys.

    pos_cg (3, G, 128), radius_g/dynamic_g (G, 128); exclusions (E, G, 128)
    partner indices or -1.  Returns:
      nb        (D, G, 128) int32 partner index (-1 empty)
      key       (D, G, 128) int32 the slot's selection key (q * N + partner)
      thr       (G, 128)    int32 largest key this body kept (INT32_MAX if
                            the body kept every overlapping candidate)
      candidate_slots       int32 total directed overlap slots pre-capacity
    """
    g = radius_g.shape[0]
    n = g * 128
    px = pos_cg[0].reshape(n)
    py = pos_cg[1].reshape(n)
    pz = pos_cg[2].reshape(n)
    radius = radius_g.reshape(n)
    dynamic = dynamic_g.reshape(n)
    d2 = (
        (px[:, None] - px[None, :]) ** 2
        + (py[:, None] - py[None, :]) ** 2
        + (pz[:, None] - pz[None, :]) ** 2
    )
    rsum = radius[:, None] + radius[None, :] + margin
    ii = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    # Rank candidates by SPHERE GAP (surface distance), not center
    # distance: a huge static slab's center is "far" from every body even
    # while touching it, and center-ranked eviction under a transient
    # overflow would drop the ground contact first — bodies then tunnel
    # through the floor (observed on Stress1000 landing cascades).  Gap
    # ranking keeps the most-overlapping pairs, so capacity eviction can
    # only ever drop the least-engaged margin candidates.
    gap = jnp.sqrt(d2) - rsum
    # rsum > margin rejects padding bodies (sentinel negative radius).
    mask = (gap <= 0.0) & (rsum > margin) & (ii != jj) & dynamic[:, None]

    # isConstrainedTo exclusions BEFORE slot selection (rigid.cpp:61-69):
    # an excluded partner never occupies a neighbor slot.
    excl = exclusions.reshape(exclusions.shape[0], n) if exclusions.shape[0] else None
    if excl is not None:
        for e in range(excl.shape[0]):
            mask &= jj != excl[e][:, None]

    candidate_slots = jnp.sum(mask.astype(jnp.int32))

    # Pack (gap, partner) into one strictly-increasing int32 key: q in
    # [0, q_max) quantizes the gap over [-2*max_r, 0] (selection-only
    # resolution ~1e-6 of the range).  Unique keys make deepest-first
    # selection and the symmetric threshold test exact integer logic with
    # no float-tie ambiguity.  The gap expression is bit-exact symmetric
    # (d2 and rsum both are), so both endpoints quantize identically.
    q_max = (2**31 - 1) // n - 1
    max_r = jnp.max(radius) + 0.5 * margin
    gap_range = jnp.maximum(2.0 * max_r, 1e-6)
    q = jnp.clip(
        (gap + gap_range) * (q_max / gap_range), 0.0, float(q_max)
    ).astype(jnp.int32)
    key = q * n + jj

    score = jnp.where(mask, -key, INT32_MIN)
    vals, nb = lax.top_k(score, degree)            # (N, D) deepest-first
    valid = vals > INT32_MIN
    nb = jnp.where(valid, nb, -1)
    key_slot = jnp.where(valid, -vals, 0)
    last = vals[:, degree - 1]
    thr = jnp.where(last > INT32_MIN, -last, INT32_MAX)

    return (
        nb.T.reshape(degree, g, 128),
        key_slot.T.reshape(degree, g, 128),
        thr.reshape(g, 128),
        candidate_slots,
    )


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


def neighbor_lists(pos_cg, radius_g, dynamic_g, exclusions, degree: int):
    """Portable one-call broadphase: candidates + symmetric filter (native
    gather).  Returns (neighbors (D, G, 128) int32 with -1 empty, overflow =
    dropped directed slots)."""

    def xla_gather(table, idx):
        return table.reshape(-1)[idx.reshape(-1)].reshape(idx.shape)

    nb, key, thr, candidate_slots = candidate_lists(
        pos_cg, radius_g, dynamic_g, exclusions, degree
    )
    nb, kept = symmetric_filter(nb, key, thr, dynamic_g, xla_gather)
    return nb, candidate_slots - kept
