"""ONE world body-sharded over a mesh matches the single-device solver.

This is the distributed lift the reference cannot express (its broadphase
and solver are single-threaded C++, README.md:158-162): the same World,
split along the body-group axis over N devices, advanced by
parallel.sharded (shard_map + all-gather partner reads + all-reduced
gates), must reproduce the portable single-device trajectory.

Tolerances: collectives re-associate float reductions (psum of per-shard
partials vs one jnp.sum), so bit-exactness is not expected; the trajectory
envelope is asserted instead, plus exact agreement of the integer
diagnostics (contact/manifold counts) whose inputs are integer keys.
"""

import numpy as np
import pytest

import jax

from avbd3d_tpu.config import SolverParams
from avbd3d_tpu.models.scenes import SceneBuilder
from avbd3d_tpu.parallel import make_world_mesh, shard_world, sharded_run
from avbd3d_tpu.solver import run_steps


def _pile_scene(min_bodies):
    sb = SceneBuilder()
    sb.add_body((40, 1, 40), 0.0, 0.5, (0, -0.5, 0))
    rng = np.random.default_rng(5)
    for i in range(40):
        x, z = divmod(i, 8)
        sb.add_body(
            (1, 1, 1), 1.0, 0.5,
            (1.1 * x - 2.0 + 0.02 * float(rng.standard_normal()),
             0.55 + 1.1 * (i % 3),
             1.1 * z - 4.0 + 0.02 * float(rng.standard_normal())),
        )
    world, params, cap, _ = sb.build(
        SolverParams(ballistic=False), max_degree=8, min_bodies=min_bodies
    )
    return world, params, cap.replace(backend="xla")


@pytest.mark.slow
@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_world_matches_single_device(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip(f"needs {n_dev} devices")
    world, params, cap = _pile_scene(min_bodies=1024)
    assert world.bodies.g % n_dev == 0

    mesh = make_world_mesh(n_dev)
    w_single = world
    w_shard = shard_world(world, mesh)

    for _ in range(4):
        w_single = run_steps(w_single, params, cap, 10)
        w_shard = sharded_run(w_shard, params, cap, mesh, n_steps=10)

        d1 = jax.device_get(w_single.diagnostics)
        d2 = jax.device_get(w_shard.diagnostics)
        assert int(d1.active_contacts) == int(d2.active_contacts)
        assert int(d1.active_manifolds) == int(d2.active_manifolds)
        assert int(d2.sanitized) == 0
        np.testing.assert_allclose(
            float(d2.max_penetration), float(d1.max_penetration), atol=1e-4
        )

    p1 = np.asarray(w_single.bodies.pos_n3)[:41]
    p2 = np.asarray(w_shard.bodies.pos_n3)[:41]
    np.testing.assert_allclose(p2, p1, atol=5e-4)
    q1 = np.asarray(w_single.bodies.quat_n4)[:41]
    q2 = np.asarray(w_shard.bodies.quat_n4)[:41]
    np.testing.assert_allclose(q2, q1, atol=5e-4)


@pytest.mark.slow
def test_sharded_world_rejects_bad_group_split():
    world, params, cap = _pile_scene(min_bodies=384)  # G=3
    mesh = make_world_mesh(2)
    with pytest.raises(ValueError, match="not divisible"):
        sharded_run(world, params, cap, mesh, n_steps=1)
