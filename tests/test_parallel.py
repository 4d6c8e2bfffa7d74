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
