"""Broadphase: all-pairs bounding-sphere culling to per-body neighbor lists.

The reference broadphase is an O(n^2) double loop over linked lists that
allocates a ``Manifold`` per overlapping pair (solver.cpp:261-270) and skips
pairs already linked by any force via ``isConstrainedTo`` (rigid.cpp:61-69).

TPU rebuild: one (N, N) masked tensor op, then a per-row ``top_k`` compacts
each body's overlapping partners into D static neighbor slots (ascending
index, deterministic).  The output feeds the replicated body-major contact
cache directly — no global pair list, no sort, no scatter.  Exclusions
(jointed / spring-linked / ignored pairs) are filtered against a per-body
partner table, mirroring isConstrainedTo semantics.

Overflow (a body with more overlaps than D slots) is counted, never silent.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def neighbor_lists(pos_cg, radius_g, dynamic_g, exclusions, degree: int):
    """Per-body neighbor slots.

    pos_cg (3, G, 128), radius_g/dynamic_g (G, 128); exclusions
    (E, G, 128) partner indices or -1.  Returns (neighbors (D, G, 128)
    int32 with -1 empty, overflow count).

    Static bodies get no slots: they are never position-solved
    (solver.cpp:345-347), so a static-dynamic pair lives only in the
    dynamic body's replica.  This matters for capacity — a ground slab
    overlaps every body's bounding sphere.
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

    row_count = jnp.sum(mask.astype(jnp.int32), axis=1)
    overflow = jnp.sum(jnp.maximum(row_count - degree, 0))

    # Keep the D *nearest* partners: when a body has more overlaps than
    # slots, the dropped ones are the farthest (usually not yet touching),
    # which also minimizes neighbor-set asymmetry between the two replicas
    # of a pair.
    score = jnp.where(mask, -d2, -jnp.inf)
    vals, nb = lax.top_k(score, degree)             # (N, D) nearest-first
    valid = vals > -jnp.inf
    nb = jnp.where(valid, nb, -1)

    nb = nb.T.reshape(degree, g, 128)
    if exclusions.shape[0] > 0:
        keep = jnp.ones_like(nb, bool)
        for e in range(exclusions.shape[0]):
            keep &= nb != exclusions[e][None]
        nb = jnp.where(keep, nb, -1)
    return nb, overflow
