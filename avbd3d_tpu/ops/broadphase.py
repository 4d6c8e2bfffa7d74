"""Broadphase: all-pairs bounding-sphere culling to per-body neighbor lists.

The reference broadphase is an O(n^2) double loop over linked lists that
allocates a ``Manifold`` per overlapping pair (solver.cpp:261-270) and skips
pairs already linked by any force via ``isConstrainedTo`` (rigid.cpp:61-69).

TPU rebuild, in two stages:

1. ``candidate_lists`` (XLA): one (N, N) masked tensor op + per-row
   ``top_k`` compacts each body's overlapping partners into D static
   neighbor slots, nearest-first.  Distances are packed into strictly unique
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

import jax.numpy as jnp
from jax import lax

INT32_MIN = jnp.int32(-(2**31) + 1)
INT32_MAX = jnp.int32(2**31 - 1)


def candidate_lists(pos_cg, radius_g, dynamic_g, exclusions, degree: int):
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
    rsum = radius[:, None] + radius[None, :]
    ii = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    # rsum > 0 rejects padding bodies (sentinel negative radius).
    mask = (d2 <= rsum * rsum) & (rsum > 0.0) & (ii != jj) & dynamic[:, None]

    # isConstrainedTo exclusions BEFORE slot selection (rigid.cpp:61-69):
    # an excluded partner never occupies a neighbor slot.
    excl = exclusions.reshape(exclusions.shape[0], n) if exclusions.shape[0] else None
    if excl is not None:
        for e in range(excl.shape[0]):
            mask &= jj != excl[e][:, None]

    candidate_slots = jnp.sum(mask.astype(jnp.int32))

    # Pack (distance, partner) into one strictly-increasing int32 key:
    # q in [0, q_max) quantizes d2 over the maximum possible overlap
    # distance (selection-only resolution ~1e-6 of the range).  Unique keys
    # make nearest-D selection and the symmetric threshold test exact
    # integer logic with no float-tie ambiguity.
    q_max = (2**31 - 1) // n - 1
    max_r = jnp.max(radius)
    inv_range = jnp.where(max_r > 0.0, 1.0 / jnp.maximum(4.0 * max_r * max_r, 1e-12), 0.0)
    q = jnp.clip((d2 * inv_range * q_max), 0.0, float(q_max)).astype(jnp.int32)
    key = q * n + jj

    score = jnp.where(mask, -key, INT32_MIN)
    vals, nb = lax.top_k(score, degree)            # (N, D) nearest-first
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


def symmetric_filter(nb, key, thr, dynamic_g, gather):
    """Drop directed slots whose dynamic partner did not keep the pair.

    All operands component-major: nb/key (D, G, 128), thr/dynamic_g
    (G, 128).  ``gather(table_g128, idx_dg128)`` is the backend's gather
    strategy (xla_gather on the portable path, select_gather inside Mosaic).
    Returns (filtered nb, kept directed-slot count).
    """
    d, g, _ = nb.shape
    n = g * 128
    valid = nb >= 0
    idx = jnp.where(valid, nb, 0)
    own = (
        lax.broadcasted_iota(jnp.int32, (d, g, 128), 1) * 128
        + lax.broadcasted_iota(jnp.int32, (d, g, 128), 2)
    )
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
