"""Data-parallel batched simulation over a jax.sharding.Mesh.

A batch of independent worlds is one pytree whose leaves carry a leading
batch axis; ``batched_step`` is ``vmap(step)`` jitted with the batch axis
sharded across the mesh's ``data`` axis.  Because every per-world computation
is independent, XLA inserts no collectives — each device advances its shard
of worlds locally, which is the right layout for sweep/RL workloads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Capacity, SolverParams
from ..solver import step
from ..state import World


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(devices, (axis,))


def replicate_world(world: World, batch: int) -> World:
    """Tile one world into a batch (leading axis) of identical worlds."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), world
    )


def shard_batch(worlds: World, mesh: Mesh, axis: str = "data") -> World:
    """Place the batch axis of every leaf across the mesh."""
    def place(x):
        return jax.device_put(x, NamedSharding(mesh, P(axis, *(None,) * (x.ndim - 1))))

    return jax.tree_util.tree_map(place, worlds)


@functools.partial(jax.jit, static_argnames=("params", "cap"))
def batched_step(worlds: World, params: SolverParams, cap: Capacity) -> World:
    """One step for every world in the batch (shardings propagate).

    Uses the XLA backend: vmapping the whole-VMEM Pallas mega-kernels is
    not meaningful — batched worlds tile the portable path instead."""
    cap = cap.replace(backend="xla")
    return jax.vmap(lambda w: step.__wrapped__(w, params, cap))(worlds)
