"""Broadphase: all-pairs bounding-sphere culling to a static-shape pair list.

The reference broadphase is an O(n^2) double loop over linked lists that
allocates a ``Manifold`` per overlapping pair (solver.cpp:261-270) and skips
pairs already linked by any force via ``isConstrainedTo`` (rigid.cpp:61-69).

TPU rebuild: the pair test is one (N, N) masked tensor op; compaction to a
fixed-capacity sorted key list uses ``top_k`` so the result has a static
shape.  Keys are ``i * N + j`` with ``i < j`` — ascending key order doubles
as a canonical pair identity used for cross-step contact-cache matching.
Exclusions (jointed / spring-linked / ignored pairs) are scattered into the
mask up front, mirroring isConstrainedTo semantics.

Overflow (more overlapping pairs than capacity) is counted, never silent.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..state import INACTIVE_KEY


def sphere_pairs(pos, radius, exclusion_keys, max_pairs: int):
    """Return (keys (P,), n_overlap) — sorted candidate pair keys.

    pos (N, 3), radius (N,); exclusion_keys sorted int32 (E,) of suppressed
    pairs (may be empty).
    """
    n = pos.shape[0]
    dp = pos[:, None, :] - pos[None, :, :]
    d2 = jnp.sum(dp * dp, axis=-1)
    rsum = radius[:, None] + radius[None, :]
    ii = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    # rsum > 0 also rejects padding bodies (sentinel negative radius).
    mask = (d2 <= rsum * rsum) & (rsum > 0.0) & (ii < jj)

    mask_flat = mask.reshape(-1)
    if exclusion_keys.shape[0] > 0:
        excl = jnp.clip(exclusion_keys, 0, n * n - 1)
        mask_flat = mask_flat.at[excl].set(False)

    n_overlap = jnp.sum(mask_flat.astype(jnp.int32))
    keys_flat = jnp.where(mask_flat, ii.reshape(-1) * n + jj.reshape(-1), INACTIVE_KEY)
    # top_k of negated keys = the max_pairs smallest keys, ascending.
    neg_top, _ = lax.top_k(-keys_flat, max_pairs)
    keys = -neg_top
    overflow = jnp.maximum(n_overlap - max_pairs, 0)
    return keys, overflow


def decode_keys(keys, n: int):
    """keys -> (ia, ib, valid)."""
    valid = keys != INACTIVE_KEY
    safe = jnp.where(valid, keys, 0)
    return safe // n, safe % n, valid


def build_incidence(ia, ib, valid, dynamic, n_bodies: int, degree: int):
    """Build the per-body pair-incidence gather table.

    For each *dynamic* body, lists the pair slots that touch it (up to
    ``degree``), with a +/-1 side sign (+1 where the body is A).  This is
    built once per step; the 20x solver iterations then aggregate constraint
    forces with dense gathers instead of scatter-adds — the TPU-friendly
    replacement for the reference's per-body force linked lists
    (force.cpp:12-30).

    Static bodies are excluded: they are never position-solved
    (solver.cpp:345-347), so rows touching them only act through the dynamic
    side.  This matters for capacity: a ground slab can touch hundreds of
    bodies, far beyond any reasonable per-body degree.

    Returns (inc (N, D) int32 pair index or -1, side (N, D) float32 +/-1,
    overflow count).
    """
    p = ia.shape[0]
    valid_a = valid & dynamic[jnp.clip(ia, 0, n_bodies - 1)]
    valid_b = valid & dynamic[jnp.clip(ib, 0, n_bodies - 1)]
    body = jnp.concatenate([jnp.where(valid_a, ia, n_bodies), jnp.where(valid_b, ib, n_bodies)])
    pair_idx = jnp.concatenate([jnp.arange(p, dtype=jnp.int32)] * 2)
    side = jnp.concatenate([jnp.ones(p, jnp.float32), -jnp.ones(p, jnp.float32)])

    order = jnp.argsort(body, stable=True)
    body_s = body[order]
    pair_s = pair_idx[order]
    side_s = side[order]
    first = jnp.searchsorted(body_s, body_s, side="left")
    rank = jnp.arange(2 * p, dtype=jnp.int32) - first.astype(jnp.int32)

    ok = (body_s < n_bodies) & (rank < degree)
    overflow = jnp.sum(((body_s < n_bodies) & (rank >= degree)).astype(jnp.int32))

    row = jnp.where(ok, body_s, n_bodies)
    col = jnp.where(ok, rank, 0)
    inc = jnp.full((n_bodies + 1, degree), -1, jnp.int32)
    inc = inc.at[row, col].set(jnp.where(ok, pair_s, -1), mode="drop")
    sides = jnp.zeros((n_bodies + 1, degree), jnp.float32)
    sides = sides.at[row, col].set(jnp.where(ok, side_s, 0.0), mode="drop")
    return inc[:n_bodies], sides[:n_bodies], overflow
