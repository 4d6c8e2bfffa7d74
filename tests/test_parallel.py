"""Batched multi-world execution over a device mesh (parallel/)."""

import numpy as np
import jax

from avbd3d_tpu import load_scene, step
from avbd3d_tpu.parallel import batched_step, make_mesh, replicate_world, shard_batch


def test_batched_worlds_match_single_world():
    scene = load_scene("TwoBlockDrop")
    n_dev = len(jax.devices())
    batch = max(2, n_dev)
    mesh = make_mesh(n_dev)
    worlds = shard_batch(replicate_world(scene.world, batch), mesh)

    for _ in range(3):
        worlds = batched_step(worlds, scene.params, scene.cap)

    # Replicated worlds stay identical across the batch.
    pos = np.asarray(worlds.bodies.pos)
    assert pos.shape[0] == batch
    np.testing.assert_array_equal(pos[0], pos[-1])

    # And match the single-world XLA backend trajectory exactly.
    w = scene.world
    cap = scene.cap.replace(backend="xla")
    for _ in range(3):
        w = step(w, scene.params, cap)
    np.testing.assert_allclose(pos[0], np.asarray(w.bodies.pos), atol=1e-6)


def test_distinct_worlds_match_their_own_single_runs():
    """DISTINCT world per device (per-world velocity kick): every device's
    trajectory must match its own unsharded single-world run — the strong
    form of the mesh-DP guarantee (non-identical workloads, VERDICT r2 #9).
    Same jit graphs as above, only the data differs."""
    import jax.numpy as jnp

    scene = load_scene("TwoBlockDrop")
    n_dev = len(jax.devices())
    batch = max(2, n_dev)
    mesh = make_mesh(n_dev)
    worlds = replicate_world(scene.world, batch)
    kick = jnp.arange(batch, dtype=jnp.float32) * 0.01
    dyn = (scene.world.bodies.inv_mass > 0).astype(jnp.float32)
    vel = worlds.bodies.linvel.at[:, 0].add(kick[:, None, None] * dyn[None])
    worlds = worlds.replace(bodies=worlds.bodies.replace(linvel=vel))
    singles = [
        jax.tree_util.tree_map(lambda x: x[i], worlds)
        for i in (0, batch - 1)
    ]
    worlds = shard_batch(worlds, mesh)

    for _ in range(3):
        worlds = batched_step(worlds, scene.params, scene.cap)

    pos = np.asarray(worlds.bodies.pos)
    assert not np.allclose(pos[0], pos[-1]), "kick was lost in sharding"

    cap = scene.cap.replace(backend="xla")
    for idx, w in zip((0, batch - 1), singles):
        for _ in range(3):
            w = step(w, scene.params, cap)
        np.testing.assert_allclose(
            pos[idx], np.asarray(w.bodies.pos), rtol=1e-5, atol=1e-6
        )
