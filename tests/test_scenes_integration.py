"""Golden-trace style integration tests (SURVEY.md §4).

The reference ships no automated tests; its de-facto harness is headless
runs of deterministic scenes judged on diagnostics envelopes (settling,
penetration vs slop, no NaN).  These tests formalize that on the CPU
backend with the smaller scenes (Stress1000 stays on TPU in bench.py).
"""

import numpy as np
import jax

from avbd3d_tpu import load_scene, run_steps, step


def _run(name, steps):
    scene = load_scene(name)
    w = scene.world
    w = run_steps(w, scene.params, scene.cap, steps)
    return scene, w, jax.device_get(w.diagnostics)


def test_two_block_drop_settles_without_rebounce():
    # scenes.h:74-85: tips, lands, settles; reference envelope: fully
    # settled by step 300, maxLin = 0.000, 2 manifolds / 8 contacts.
    scene, w, d = _run("TwoBlockDrop", 300)
    assert float(d.max_linear_speed) < 0.01
    assert float(d.max_penetration) <= 0.005
    assert int(d.active_manifolds) == 2
    assert int(d.active_contacts) == 8
    assert int(d.sanitized) == 0
    # Both cubes rest at ~0.51 (margin-lifted) on the ground.
    ys = np.asarray(w.bodies.pos_n3[1:3, 1])
    assert np.all(np.abs(ys - 0.51) < 0.02)


def test_stack_stays_stacked():
    scene, w, d = _run("Stack", 300)
    ys = np.asarray(w.bodies.pos_n3[1:11, 1])
    expected = 0.51 + 1.01 * np.arange(10)
    assert np.all(np.abs(ys - expected) < 0.15), ys
    assert float(d.max_penetration) <= 0.005
    assert int(d.sanitized) == 0


def test_stack_transient_penetration_stays_under_slop():
    # PARITY.md round-2 lockstep trace: the Jacobi primal at the scene's
    # 10 iterations transiently penetrated 0.0095 > slop 0.005 during the
    # stack landing (C++ Gauss-Seidel stays at 0.0000, solver.h:36).  The
    # impact iteration boost (config.impact_iterations) runs extra sweeps
    # on energetic near-contact steps; measured worst transient with the
    # boost: 0.0004.  Stepwise (not just final) envelope over the landing.
    scene = load_scene("Stack")
    assert scene.params.impact_iterations > scene.params.iterations
    w = scene.world
    worst = 0.0
    for _ in range(12):
        w = run_steps(w, scene.params, scene.cap, 10)
        worst = max(worst, float(w.diagnostics.max_penetration))
    assert worst <= scene.params.penetration_slop, worst


def test_pyramid_rests_with_full_contact_graph():
    # Reference envelope: 100 manifolds / 400 contacts at rest.  A few
    # margin-distance pairs flicker with f32 trajectory chaos, so accept a
    # tight band around the envelope.
    scene, w, d = _run("Pyramid", 300)
    assert 90 <= int(d.active_manifolds) <= 105
    assert 360 <= int(d.active_contacts) <= 420
    assert float(d.max_penetration) <= 0.005
    assert float(d.max_linear_speed) < 0.2


def test_wall_is_stable_under_shear():
    scene, w, d = _run("Wall", 300)
    assert 100 <= int(d.active_manifolds) <= 130   # reference: 116
    assert float(d.max_penetration) <= 0.005
    assert float(d.max_linear_speed) < 0.2
    # No brick fell off: all heights within the built wall envelope.
    ys = np.asarray(w.bodies.pos_n3[1:65, 1])
    assert ys.min() > 0.1 and ys.max() < 4.5


def test_empty_and_ground_run():
    for name in ("Empty", "Ground"):
        scene, w, d = _run(name, 5)
        assert int(d.active_manifolds) == 0
        assert int(d.dynamic_bodies) == 0


def test_single_step_matches_scan():
    scene = load_scene("TwoBlockDrop")
    w1 = scene.world
    for _ in range(3):
        w1 = step(w1, scene.params, scene.cap)
    w2 = run_steps(scene.world, scene.params, scene.cap, 3)
    np.testing.assert_allclose(
        np.asarray(w1.bodies.pos), np.asarray(w2.bodies.pos), atol=1e-6
    )


def test_headless_print_order_and_format(capsys):
    # The CLI is the observable contract (main.cpp:223-248): newest body
    # first, exact field layout.
    from avbd3d_tpu.cli import main

    main(["--nogfx", "--scene", "Ground", "--steps", "1"])
    out = capsys.readouterr().out
    lines = out.splitlines()
    assert lines[0].startswith("Running in headless mode: scene 'Ground'")
    # In-solver diagnostics line first (solver.cpp:503-513; 1-based step),
    # then main's dump (main.cpp:228-244).
    assert lines[1].startswith("[Physics] step 1 | manifolds: 0 | contacts: 0")
    assert lines[2] == "Step 0:"
    assert lines[3].startswith("  Body 1: Pos(0.0000, -0.5000, 0.0000)")
    assert "Rot(0.0000, 0.0000, 0.0000, 1.0000)" in lines[3]
    assert lines[4].startswith("  Diagnostics: manifolds=0 contacts=0 dynBodies=0")
