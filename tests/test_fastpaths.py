"""Falling-regime fast paths: compensated broadphase anchors, the
mover-static slack bound, the broadphase probe, and the ballistic step.

These target the round-3 falling-regime work (VERDICT r2 next-steps #3):
coherent free-fall must neither rebuild the candidate cache every step nor
run the 20-iteration solve when the probe proves zero contacts — while
every safety invariant (superset candidates, narrowphase-empty proof,
slack-gated static approach) stays exact.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avbd3d_tpu import load_scene
from avbd3d_tpu.config import SolverParams
from avbd3d_tpu.models.scenes import SceneBuilder
from avbd3d_tpu.ops import replicated as rep
from avbd3d_tpu.ops.broadphase import bp_probe
from avbd3d_tpu.solver import step


def _swarm_scene(kick=None):
    """Ground + 8 separated cubes falling coherently from y=30."""
    sb = SceneBuilder()
    sb.add_body((100, 1, 100), 0.0, 0.5, (0, -0.5, 0))
    for i in range(8):
        vel = kick if (kick is not None and i == 3) else (0.0, 0.0, 0.0)
        sb.add_body((1, 1, 1), 1.0, 0.5,
                    (3.0 * (i % 3) - 3.0, 30.0 + (i // 3) * 3.0, 2.0 * (i % 2)),
                    linvel=vel)
    return sb.build(SolverParams(), max_degree=8)


def test_coherent_fall_reuses_candidate_cache():
    world, params, cap, n_real = _swarm_scene()
    world = step(world, params, cap)          # first step: forced refresh
    anchor0 = np.asarray(world.bp.anchor)
    for _ in range(10):
        world = step(world, params, cap)
    # Coherent free fall: compensated displacement stays ~0 and the ground
    # slab is ~28 m below (AABB slack far exceeds 11 steps of fall), so the
    # anchor (and the whole candidate bundle) must not have refreshed.
    assert float(jax.device_get(world.bp.slack)) > 20.0
    np.testing.assert_array_equal(np.asarray(world.bp.anchor), anchor0)
    # And the physics is actual free fall, not a stalled sim: 11 steps of
    # gravity drop every cube by ~0.17 m from its spawn height.
    ys = np.asarray(world.bodies.pos_n3[1:9, 1])
    ys0 = np.array([30.0 + (i // 3) * 3.0 for i in range(8)])
    assert np.all(ys0 - ys > 0.1), ys0 - ys


def test_incoherent_motion_refreshes_candidate_cache():
    world, params, cap, n_real = _swarm_scene(kick=(4.0, 0.0, 0.0))
    world = step(world, params, cap)
    anchor0 = np.asarray(world.bp.anchor)
    for _ in range(10):
        world = step(world, params, cap)
    # One body drifting sideways at 4 m/s breaks the common-translation
    # bound within 10 steps (bp_margin 0.04 => margin/2 = 2 cm).
    assert not np.array_equal(np.asarray(world.bp.anchor), anchor0)


def test_slack_prevents_tunneling_into_small_static():
    # A SMALL static box (not an always-candidate slab): the single falling
    # body's own motion is perfectly coherent (mean displacement == its
    # displacement), so WITHOUT the mover-static slack bound the cache
    # would never refresh and the body would fall straight through.
    sb = SceneBuilder()
    sb.add_body((1, 1, 1), 0.0, 0.5, (0, 0.0, 0))        # static box
    sb.add_body((1, 1, 1), 1.0, 0.5, (0, 10.0, 0))       # falling cube
    world, params, cap, _ = sb.build(SolverParams(), max_degree=4)
    assert float(jax.device_get(step(world, params, cap).bp.slack)) < 10.0
    for _ in range(200):
        world = step(world, params, cap)
    d = jax.device_get(world.diagnostics)
    y = float(jax.device_get(world.bodies.pos_n3[1, 1]))
    assert abs(y - 1.0) < 0.05, f"rest height {y} (tunneled?)"
    assert float(d.max_penetration) < 0.01
    assert int(d.sanitized) == 0


def test_probe_proves_no_contacts():
    # Safe direction of the ballistic predicate: min candidate sphere gap >
    # collision margin at the pre-step poses implies the step finds zero
    # contacts.  Checked along a real landing trajectory.
    world, params, cap, _ = _swarm_scene()
    g_len = float(sum(x * x for x in params.gravity) ** 0.5)
    for _ in range(60):
        b = world.bodies
        prev_world = world
        world = step(world, params, cap)
        bp = world.bp
        min_gap, n_slots, _near = bp_probe(
            bp.nb, tuple(b.pos[k] for k in range(3)),
            tuple(b.quat[k] for k in range(4)),
            tuple(b.size[k] * 0.5 for k in range(3)), b.radius,
            tuple(b.linvel[k] for k in range(3)),
            tuple(b.angvel[k] for k in range(3)),
            params.dt, params.collision_margin, g_len, rep.xla_gather,
        )
        if (float(min_gap) > params.collision_margin
                and int(n_slots) == int(jax.device_get(bp.cand))):
            d = jax.device_get(world.diagnostics)
            assert int(d.active_contacts) == 0


def test_ballistic_step_matches_full_solve():
    # Steps from a contact-free state: ballistic on vs off must agree to
    # f32 round-off (the zero-row primal converges to the inertial pose).
    # Three steps, because the fast path arms itself from the carried
    # control block (state.Diagnostics lanes 11-15): step 1 runs the full
    # solve under the pessimistic reset block, steps 2-3 take the
    # ballistic branch.
    world, params, cap, _ = _swarm_scene()
    p_off = params.replace(ballistic=False)
    w_on, w_off = world, world
    for _ in range(3):
        w_on = step(w_on, params, cap)
        w_off = step(w_off, p_off, cap)
    np.testing.assert_allclose(
        np.asarray(w_on.bodies.pos), np.asarray(w_off.bodies.pos), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(w_on.bodies.linvel), np.asarray(w_off.bodies.linvel),
        atol=1e-4,
    )


@pytest.mark.slow
def test_ballistic_trajectory_through_landing():
    # Full fall + landing + settle with the fast path on vs off: bounded
    # drift, identical stability envelope.
    world, params, cap, _ = _swarm_scene()
    p_off = params.replace(ballistic=False)
    w_on, w_off = world, world
    drift = []
    for _ in range(150):
        w_on = step(w_on, params, cap)
        w_off = step(w_off, p_off, cap)
        drift.append(float(jnp.max(jnp.abs(w_on.bodies.pos - w_off.bodies.pos))))
    assert max(drift[:40]) < 1e-3, f"pre-contact drift {max(drift[:40]):.2e}"
    for w in (w_on, w_off):
        d = jax.device_get(w.diagnostics)
        assert float(d.max_penetration) < 0.01
        assert int(d.sanitized) == 0
        ys = np.asarray(w.bodies.pos_n3[1:9, 1])
        assert np.all(ys > 0.4), ys  # everyone landed on the slab
