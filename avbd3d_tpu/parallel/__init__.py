"""Multi-device execution: batched worlds over a device mesh.

The reference is strictly single-process (SURVEY.md §2: no DP/TP/PP/SP/EP
anywhere).  The TPU-native scaling axes for a physics engine are:

- **world batch** (data parallel): many independent simulations, sharded
  across the mesh — parameter sweeps, RL environments, domain randomization.
- **pair/contact dimension** (the tensor-parallel analog): the P-sized
  constraint buffers dominate compute; they can be sharded with a psum over
  per-body force accumulation.

``batched`` implements the first (vmap + sharding over a Mesh axis).
"""

from .batched import batched_step, make_mesh, replicate_world, shard_batch

__all__ = ["batched_step", "make_mesh", "replicate_world", "shard_batch"]
