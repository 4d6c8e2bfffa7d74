"""Coverage for the flagship Pallas backend's math, off-TPU.

``solver_tpu`` runs phases 2-6 inside two Mosaic kernels.  On CPU the same
kernel-body functions (``_kernel_b_math``, ``rep.collide_and_init`` with the
replicated layout) execute as plain jitted XLA — same ops, same op order —
through ``step_pallas``'s math twins, so a kernel regression breaks these
tests without TPU hardware.  The one backend-dependent substitution is the
gather strategy (select_gather inside Mosaic, xla_gather on CPU), whose
value-equivalence is asserted here separately.
"""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from avbd3d_tpu import load_scene
from avbd3d_tpu.ops import replicated as rep
from avbd3d_tpu.ops.broadphase import neighbor_lists
from avbd3d_tpu.solver import step


def test_select_gather_matches_xla_gather():
    rng = np.random.default_rng(7)
    for g, d in ((1, 4), (8, 16)):
        table = jnp.asarray(rng.normal(size=(g, 128)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, g * 128, size=(d, g, 128)).astype(np.int32))
        a = np.asarray(rep.select_gather(table, idx))
        b = np.asarray(rep.xla_gather(table, idx))
        np.testing.assert_array_equal(a, b)


def test_broadphase_symmetric_under_overflow():
    """A dynamic-dynamic pair is kept either by both endpoints or neither,
    even when one endpoint's D slots overflow (VERDICT r1 weak #7)."""
    rng = np.random.default_rng(3)
    n_real, d = 60, 4  # dense cluster >> 4 slots per body
    scene = load_scene("Empty")
    from avbd3d_tpu.models.scenes import SceneBuilder

    sb = SceneBuilder()
    for i in range(n_real):
        p = rng.uniform(-1.5, 1.5, 3)
        sb.add_body((1, 1, 1), 1.0, 0.5, tuple(p))
    world, params, cap, _ = sb.build(scene.params, max_degree=d)

    b = world.bodies
    nb, overflow = neighbor_lists(
        b.pos, b.quat, tuple(b.size[k] * 0.5 for k in range(3)),
        b.radius, b.dynamic, world.exclusions, d,
    )
    nbm = np.asarray(nb)  # (D, G, 128)
    g = nbm.shape[1]
    slots = [set() for _ in range(g * 128)]
    for dd in range(d):
        for gg in range(g):
            for ll in range(128):
                j = nbm[dd, gg, ll]
                if j >= 0:
                    slots[gg * 128 + ll].add(int(j))
    dyn = np.asarray(b.dynamic).reshape(-1)
    for i in range(g * 128):
        for j in slots[i]:
            if dyn[j]:
                assert i in slots[j], f"one-sided pair ({i}, {j})"
    assert int(overflow) > 0  # the cluster must actually overflow


def _run_pair(name, n_steps):
    scene = load_scene(name)
    # Deterministic-cadence config for backend EQUIVALENCE: the ballistic
    # probe and the speed-gated stale-Hessian cadence are knife-edge
    # branches on continuous state — once the two backends' f32 op-order
    # drift (~1e-6) crosses a gate boundary on different steps, the
    # cadences diverge and the comparison measures branch chaos, not
    # kernel math.  Both features are backend-SHARED code (solver.py),
    # covered at default params by test_fastpaths and the scene/parity
    # suites; k=1 + no-ballistic also keeps the traced step graph small
    # enough for XLA:CPU's pathological fusion pass (PERF_NOTES.md).
    params = scene.params.replace(lhs_rebuild_every=1, ballistic=False)
    capx = scene.cap.replace(backend="xla")
    capp = scene.cap.replace(backend="pallas")
    wx = wp = scene.world
    drift = []
    for _ in range(n_steps):
        wx = step(wx, params, capx)
        wp = step(wp, params, capp)
        drift.append(
            float(jnp.max(jnp.abs(wx.bodies.pos - wp.bodies.pos)))
        )
    return wx, wp, drift


@pytest.mark.slow
def test_pallas_math_matches_xla_trajectory_two_block_drop():
    wx, wp, drift = _run_pair("TwoBlockDrop", 100)
    # Early trajectory: the two backends track tightly before f32 chaos
    # amplifies op-order differences.
    assert max(drift[:30]) < 2e-3, f"early drift {max(drift[:30]):.2e}"
    # Full-run envelope: bounded divergence, identical stability.
    assert max(drift) < 0.2, f"drift {max(drift):.2e}"
    for w in (wx, wp):
        d = jax.device_get(w.diagnostics)
        assert float(d.max_penetration) < 0.01
        assert int(d.sanitized) == 0
        assert int(d.pair_overflow) == 0


@pytest.mark.slow
def test_pallas_math_matches_xla_trajectory_rod_jointed():
    # Hard-weld chain with 2-color Gauss-Seidel sub-passes: smooth dynamics
    # (no contacts), so the backends track to float precision.
    wx, wp, drift = _run_pair("RodJointed", 30)
    assert max(drift) < 1e-3, f"drift {max(drift):.2e}"
    for w in (wx, wp):
        d = jax.device_get(w.diagnostics)
        assert int(d.sanitized) == 0


@pytest.mark.slow
def test_pallas_math_matches_xla_soft_grid_envelope():
    # Soft-welded sheet: contact onset is chaotic (a 1e-6 perturbation on
    # the SAME backend diverges to ~2.7 within 30 steps — measured), so
    # parity is pre-contact tracking + behavioral envelope.
    wx, wp, drift = _run_pair("SoftGrid", 40)
    assert max(drift[:2]) < 1e-4, f"pre-contact drift {max(drift[:2]):.2e}"
    for w in (wx, wp):
        d = jax.device_get(w.diagnostics)
        assert int(d.sanitized) == 0
        pos = np.asarray(w.bodies.pos_n3)
        n_real = int(np.asarray(w.bodies.dynamic).sum()) + 1
        assert np.all(np.abs(pos[:n_real]) < 25.0)


@pytest.mark.slow
def test_pallas_math_matches_xla_trajectory_stack():
    wx, wp, drift = _run_pair("Stack", 80)
    assert max(drift[:30]) < 2e-3, f"early drift {max(drift[:30]):.2e}"
    assert max(drift) < 0.2, f"drift {max(drift):.2e}"
    dx = jax.device_get(wx.diagnostics)
    dp = jax.device_get(wp.diagnostics)
    # Near-identical contact census at the same step on a resting stack
    # (float drift can flip a persistence-margin manifold at the boundary).
    assert abs(int(dx.active_manifolds) - int(dp.active_manifolds)) <= 1
    assert abs(int(dx.active_contacts) - int(dp.active_contacts)) <= 4
    for d in (dx, dp):
        assert float(d.max_penetration) < 0.01
        assert int(d.sanitized) == 0
