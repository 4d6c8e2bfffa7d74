"""Component tests: joints, springs, collision filtering, raycast pick,
checkpoint round-trip (SURVEY.md section 2 rows 9-12 + aux subsystems)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from avbd3d_tpu import SceneBuilder, SolverParams, load_scene, run_steps, step
from avbd3d_tpu.queries import pick
from avbd3d_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _world_anchor(w, body, local):
    from avbd3d_tpu.maths import quat_rotate

    p = w.bodies.pos_n3[body]
    q = w.bodies.quat_n4[body]
    return np.asarray(p + quat_rotate(q, jnp.asarray(local, jnp.float32)))


@pytest.mark.slow  # 739 s on 1 CPU core
def test_weld_joint_chain_holds():
    # The rod the reference intended (scenes.h:138-151): segments welded end
    # to end below a static anchor must stay connected under gravity.
    scene = load_scene("RodJointed")
    w = run_steps(scene.world, scene.params, scene.cap, 200)
    d = jax.device_get(w.diagnostics)
    assert int(d.sanitized) == 0
    # Static anchor unmoved.
    np.testing.assert_allclose(
        np.asarray(w.bodies.pos_n3[0]), [0.0, 10.0, 0.0], atol=1e-5
    )
    # Each pair of welded anchors stays coincident (within stabilization tol).
    for k in range(14):
        pa = _world_anchor(w, k, (0.0, -0.5, 0.0))
        pb = _world_anchor(w, k + 1, (0.0, 0.5, 0.0))
        assert np.linalg.norm(pa - pb) < 0.02, (k, pa, pb)


def test_weld_drift_under_load():
    # Steady-state anchor drift of a loaded hard weld: a heavy cube hanging
    # from a static anchor by one weld.  Penalty-only hard joints bound the
    # drift by F / penalty; assert it stays far below the collision slop.
    # Behavioral bar: the REFERENCE diverges to NaN on hard-weld chains
    # (tools/build_reference_oracle.sh builds ref_rod which demonstrates
    # this; its joints ship commented out as "WIP", scenes.h:138-151), so
    # any finite drift beats reference behavior.
    sb = SceneBuilder()
    a = sb.add_body((1, 1, 1), 0.0, 0.5, (0.0, 10.0, 0.0))
    b = sb.add_body((1, 1, 1), 8.0, 0.5, (0.0, 9.0, 0.0))  # 8 kg -> F = 80 N
    sb.add_joint(a, b, (0.0, -0.5, 0.0), (0.0, 0.5, 0.0))
    w, p, c, _ = sb.build(SolverParams())
    w = run_steps(w, p, c, 240)
    d = jax.device_get(w.diagnostics)
    assert int(d.sanitized) == 0
    pa = _world_anchor(w, 0, (0.0, -0.5, 0.0))
    pb = _world_anchor(w, 1, (0.0, 0.5, 0.0))
    drift = np.linalg.norm(pa - pb)
    assert drift < 2.0e-3, drift
    # And the body is actually load-bearing (hangs, does not fall).
    assert float(w.bodies.pos_n3[1, 1]) > 8.9


def test_world_joint_pins_body():
    sb = SceneBuilder()
    b = sb.add_body((1, 1, 1), 1.0, 0.5, (0.0, 5.0, 0.0))
    sb.add_world_joint(b, (0.0, 5.5, 0.0))
    w, p, c, _ = sb.build(SolverParams())
    w = run_steps(w, p, c, 120)
    # Body hangs from the pinned top-face anchor; the anchor must not drift.
    anchor = _world_anchor(w, 0, (0.0, 0.5, 0.0))
    np.testing.assert_allclose(anchor, [0.0, 5.5, 0.0], atol=0.02)


def test_spring_settles_at_penalty_equilibrium():
    # Soft row physics (spring.cpp + solver.cpp:290-292): steady state
    # satisfies stiffness * C = m g  ->  C = 10 / 100 = 0.1.
    sb = SceneBuilder()
    a = sb.add_body((1, 1, 1), 0.0, 0.5, (0.0, 5.0, 0.0))
    b = sb.add_body((1, 1, 1), 1.0, 0.5, (0.0, 3.0, 0.0))
    sb.add_spring(a, b, (0, 0, 0), (0, 0, 0), stiffness=100.0)   # rest = 2.0
    w, p, c, _ = sb.build(SolverParams())
    w = run_steps(w, p, c, 600)
    dist = float(jnp.linalg.norm(w.bodies.pos_n3[0] - w.bodies.pos_n3[1]))
    assert abs(dist - 2.1) < 0.03, dist
    d = jax.device_get(w.diagnostics)
    assert int(d.active_manifolds) == 0  # spring-linked pair never collides


def test_ignore_collision_suppresses_contact():
    sb = SceneBuilder()
    sb.add_body((100, 1, 100), 0.0, 0.5, (0, -0.5, 0))
    a = sb.add_body((1, 1, 1), 1.0, 0.5, (0.0, 0.5, 0.0))
    b = sb.add_body((1, 1, 1), 1.0, 0.5, (0.0, 1.51, 0.0))
    sb.ignore_collision(a, b)
    w, p, c, _ = sb.build(SolverParams())
    w = run_steps(w, p, c, 60)
    d = jax.device_get(w.diagnostics)
    # The upper cube falls through the lower one (their pair is ignored);
    # both end up on the ground.
    ys = np.sort(np.asarray(w.bodies.pos_n3[1:3, 1]))
    assert ys[0] < 0.6
    assert int(d.active_manifolds) >= 1


def test_soft_grid_stays_bounded():
    scene = load_scene("SoftGrid")
    w = run_steps(scene.world, scene.params, scene.cap, 150)
    d = jax.device_get(w.diagnostics)
    assert int(d.sanitized) == 0
    pos = np.asarray(w.bodies.pos_n3[1 : scene.n_real])
    assert np.all(np.abs(pos) < 25.0)
    # Nothing punches through the ground slab.
    assert pos[:, 1].min() > -0.3


def test_pick_hits_top_of_stack():
    scene = load_scene("Stack")
    w = scene.world
    idx, t, local = pick(w.bodies, (0.0, 30.0, 0.0), (0.0, -1.0, 0.0))
    # Top stack cube is body index 10 (ids are index+1); hit on its +y face.
    assert int(idx) == 10
    np.testing.assert_allclose(float(local[1]), 0.5, atol=1e-4)
    # Static ground is never pickable (solver.cpp:162-164).
    idx2, _, _ = pick(w.bodies, (50.0, 30.0, 50.0), (0.0, -1.0, 0.0))
    assert int(idx2) == -1
    # Miss entirely.
    idx3, _, _ = pick(w.bodies, (0.0, 30.0, 0.0), (0.0, 1.0, 0.0))
    assert int(idx3) == -1


def test_checkpoint_roundtrip(tmp_path):
    scene = load_scene("TwoBlockDrop")
    w, p, c = scene.world, scene.params, scene.cap
    w = run_steps(w, p, c, 50)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, w, p, c)
    w2, p2, c2 = load_checkpoint(path)
    assert p2 == p and c2 == c
    a = run_steps(w, p, c, 25)
    b = run_steps(w2, p2, c2, 25)
    np.testing.assert_array_equal(np.asarray(a.bodies.pos), np.asarray(b.bodies.pos))
    np.testing.assert_array_equal(
        np.asarray(a.contacts.lam), np.asarray(b.contacts.lam)
    )
