"""Collective seam for running one world SHARDED across a device mesh.

The solver core is written against two tiny abstractions:

- ``gather(table_g128, idx_dg128)``: partner-state reads (already injected
  everywhere — xla_gather on the portable path, select_gather in Mosaic);
- ``comm``: the global reductions and table exchange a body-sharded world
  needs (this module).

``LocalComm`` is the single-device identity: every method compiles away,
so threading ``comm`` through the solver costs nothing off the sharded
path.  ``MeshComm`` maps the same calls onto XLA collectives inside
``shard_map`` — ``psum``/``pmax``/``pmin`` ride ICI all-reduces and
``all_gather_g`` tiles per-device (G_loc, 128) body tables back to the
global (G, 128) layout (device i owns groups [i*G_loc, (i+1)*G_loc), so
axis-index-ordered tiling reconstructs global group order exactly).

Every step-level gate that must take the SAME branch on every device
(broadphase cache reuse, the stale-Hessian speed gate) derives its
predicate from these all-reduces: deterministic collectives return
identical values on all participants, so ``lax.cond`` stays coherent
without any explicit synchronization.
"""

from __future__ import annotations

from jax import lax


class LocalComm:
    """Identity comm: the single-device (or per-device-independent) case."""

    n_shards = 1

    def psum(self, x):
        return x

    def pmax(self, x):
        return x

    def pmin(self, x):
        return x

    def all_gather_g(self, x):
        """(G, 128) table -> global (G, 128) table (identity locally)."""
        return x

    def row0(self, n_local: int):
        """Global body index of this shard's row 0."""
        return 0


LOCAL_COMM = LocalComm()


class MeshComm:
    """Collectives over one named mesh axis, for use inside shard_map."""

    def __init__(self, axis: str, n_shards: int):
        self.axis = axis
        self.n_shards = n_shards

    def psum(self, x):
        return lax.psum(x, self.axis)

    def pmax(self, x):
        return lax.pmax(x, self.axis)

    def pmin(self, x):
        return lax.pmin(x, self.axis)

    def all_gather_g(self, x):
        return lax.all_gather(x, self.axis, axis=0, tiled=True)

    def row0(self, n_local: int):
        return lax.axis_index(self.axis) * n_local
