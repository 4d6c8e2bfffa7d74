"""Large-N envelope regression gate (VERDICT r4 weakness #1/#4).

Round 4 shipped a Stress4096 envelope break (maxPen 0.0073 > slop, counted
overflow) because the 4096 scene inherited Stress1000-validated tuning and
nothing asserted the big scenes' envelope.  These tests step capacity-scale
stress piles through a SHORTENED land-and-settle window (the grid starts
just above the ground, so the pile forms in ~40 steps instead of ~250) and
assert the parity envelope: maxPenetration <= slop after settling, zero
counted overflow, zero sanitizer resets.  The C++ reference at the same N
holds maxPen = 0.0000 settled (measured via tools/build_reference_oracle.sh
ref_stressn, 16x16x16, steps 250-1000) — so the slop is the right bar.

Runs the same backend dispatch as production (`solver.step` auto): the
gridded Pallas tier on TPU, its XLA twins on CPU (slow).
"""

import jax
import numpy as np
import pytest

from avbd3d_tpu.config import SolverParams
from avbd3d_tpu.models.scenes import SceneBuilder, _hash01
from avbd3d_tpu.solver import run_steps, step


def _low_drop_stress(nx, ny, nz, max_degree, cache_degree, bp_window=0,
                     grid_residency=4):
    """The stress-scene construction (scenes.h:87-132 jitter) with the fall
    shortened: layers start at y=0.55 with 1.05 spacing — contact begins
    within a few steps and the pile-depth convergence regime (the thing the
    gate protects) is reached by ~step 40."""
    sb = SceneBuilder()
    sb.add_body((100, 1, 100), 0.0, 0.5, (0, -0.5, 0))
    for y in range(ny):
        for z in range(nz):
            for x in range(nx):
                seed = (x + nx * (z + nz * y) + 1) & 0xFFFFFFFF
                jx = (_hash01((seed * 9781) & 0xFFFFFFFF) * 2 - 1) * 0.04
                jz = (_hash01((seed * 6271) & 0xFFFFFFFF) * 2 - 1) * 0.04
                jy = _hash01((seed * 3343) & 0xFFFFFFFF) * 0.25
                sb.add_body((1, 1, 1), 1.0, 0.5, (
                    (x - (nx - 1) * 0.5) * 1.15 + jx,
                    0.55 + y * 1.05 + jy,
                    (z - (nz - 1) * 0.5) * 1.15 + jz,
                ))
    params = SolverParams(iterations=20, beta=30000.0, gamma=0.995,
                          lhs_fresh_rebuild_every=4)
    world, params, cap, n_real = sb.build(
        params, max_degree=max_degree, cache_degree=cache_degree)
    cap = cap.replace(bp_window=bp_window, grid_residency=grid_residency)
    return world, params, cap


def _land_and_settle(world, params, cap, land_steps, settle_steps):
    world = run_steps(world, params, cap, land_steps)
    # Settled window: every step's envelope is checked, not just the tail.
    worst_pen = 0.0
    for _ in range(settle_steps):
        world = step(world, params, cap)
        d = jax.device_get(world.diagnostics)
        worst_pen = max(worst_pen, float(d.max_penetration))
        assert int(d.sanitized) == 0
    d = jax.device_get(world.diagnostics)
    return world, worst_pen, d


@pytest.mark.slow
def test_stress2048_envelope():
    world, params, cap = _low_drop_stress(13, 12, 13, max_degree=24,
                                          cache_degree=12)
    world, worst_pen, d = _land_and_settle(world, params, cap, 60, 30)
    assert worst_pen <= params.penetration_slop, worst_pen
    assert int(d.pair_overflow) == 0 and int(d.degree_overflow) == 0


@pytest.mark.slow
def test_stress4096_envelope():
    from avbd3d_tpu.models.scenes import scene_stress4096

    # The PRODUCTION scene's capacity/cadence plan, on the shortened drop:
    # this is the gate that round 4's regression (cache_degree=12 inherited
    # unvalidated -> degree overflow + maxPen 0.0073) would have failed.
    world4, params4, cap4, _ = scene_stress4096()
    world, params, cap = _low_drop_stress(
        16, 16, 16, max_degree=cap4.max_degree,
        cache_degree=(world4.contacts.other.shape[0]),
        bp_window=cap4.bp_window, grid_residency=cap4.grid_residency)
    world, worst_pen, d = _land_and_settle(world, params4, cap, 60, 30)
    assert worst_pen <= params.penetration_slop, worst_pen
    assert int(d.pair_overflow) == 0 and int(d.degree_overflow) == 0
