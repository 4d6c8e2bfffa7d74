"""Broadphase: all-pairs bounding-sphere culling to per-body neighbor lists.

The reference broadphase is an O(n^2) double loop over linked lists that
allocates a ``Manifold`` per overlapping pair (solver.cpp:261-270) and skips
pairs already linked by any force via ``isConstrainedTo`` (rigid.cpp:61-69).

TPU rebuild: one (N, N) masked tensor op, then a per-row ``top_k`` compacts
each body's overlapping partners into D static neighbor slots
(nearest-first, deterministic).  The output feeds the replicated body-major
contact cache directly — no global pair list, no sort, no scatter.

Exclusions (jointed / spring-linked / ignored pairs — isConstrainedTo
semantics) are applied to the (N, N) mask *before* slot selection, so a
never-colliding partner can not consume one of the D neighbor slots, and
the overflow count reflects only real candidate pairs.

Overflow (a body with more overlaps than D slots) is handled symmetrically:
if either endpoint of a dynamic-dynamic pair drops the pair, both replicas
drop it — a one-sided contact force (Newton's-third-law violation) is
impossible by construction.  Dropped slots are counted, never silent.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def neighbor_lists(pos_cg, radius_g, dynamic_g, exclusions, degree: int):
    """Per-body neighbor slots.

    pos_cg (3, G, 128), radius_g/dynamic_g (G, 128); exclusions
    (E, G, 128) partner indices or -1.  Returns (neighbors (D, G, 128)
    int32 with -1 empty, overflow = dropped directed slots).

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

    # isConstrainedTo exclusions BEFORE slot selection (rigid.cpp:61-69):
    # an excluded partner never occupies a neighbor slot.
    excl = exclusions.reshape(exclusions.shape[0], n) if exclusions.shape[0] else None
    if excl is not None:
        for e in range(excl.shape[0]):
            mask &= jj != excl[e][:, None]

    candidate_slots = jnp.sum(mask.astype(jnp.int32))

    # Keep the D *nearest* partners per body: when a body has more overlaps
    # than slots, the dropped ones are the farthest (usually not yet
    # touching).
    score = jnp.where(mask, -d2, -jnp.inf)
    vals, nb = lax.top_k(score, degree)             # (N, D) nearest-first
    valid = vals > -jnp.inf
    nb_safe = jnp.where(valid, nb, 0)

    # Symmetric drop: a dynamic-dynamic pair is kept only if BOTH endpoints
    # kept it (one-sided contact forces inject momentum).  Build the exact
    # directed keep matrix by scatter, then AND with its transpose.
    kept = jnp.zeros((n, n), bool)
    rows = lax.broadcasted_iota(jnp.int32, (n, degree), 0)
    kept = kept.at[rows, nb].set(valid, mode="drop")
    sym = kept & kept.T
    partner_static = ~dynamic[nb_safe]
    slot_sym = jnp.take_along_axis(sym, nb_safe, axis=1)
    valid = valid & (slot_sym | partner_static)
    nb = jnp.where(valid, nb, -1)

    overflow = candidate_slots - jnp.sum(valid.astype(jnp.int32))

    return nb.T.reshape(degree, g, 128), overflow
