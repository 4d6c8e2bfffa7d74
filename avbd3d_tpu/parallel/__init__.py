"""Multi-device execution over a jax.sharding.Mesh.

The reference is strictly single-process (SURVEY.md §2: no DP/TP/PP/SP/EP
anywhere).  The TPU-native scaling axes for a physics engine are:

- **world batch** (data parallel): many independent simulations, sharded
  across the mesh — parameter sweeps, RL environments, domain
  randomization.  ``batched`` implements this (vmap + sharding over a
  Mesh axis; zero collectives).
- **body sharding** (the tensor-parallel analog): ONE world too large for
  a chip, its (…, G, 128) body groups split across the mesh; partner
  reads ride all-gathers on ICI and step-level gates all-reduce.
  ``sharded`` implements this (shard_map over solver._step_impl).
"""

from .batched import batched_step, make_mesh, replicate_world, shard_batch
from .sharded import (
    make_world_mesh,
    shard_world,
    sharded_run,
    sharded_step,
    world_specs,
)

__all__ = [
    "batched_step",
    "make_mesh",
    "replicate_world",
    "shard_batch",
    "make_world_mesh",
    "shard_world",
    "sharded_run",
    "sharded_step",
    "world_specs",
]
