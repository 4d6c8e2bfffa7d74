"""Grid-tier (>2048-body gridded Pallas backend) coverage, off-TPU.

``solver_tpu.step_grid`` runs the same replicated physics with the kernels
blocked over body groups; off-TPU the identical per-block math runs as
plain XLA twins (``_collide_grid_math`` / ``_iterblock_grid_call_math``)
with the SAME block decomposition — including the grid tier's bounded
cross-block pose lag (``Capacity.grid_residency`` iterations per launch) —
so a grid regression breaks these tests without TPU hardware.

Also covers the row-blocked broadphase (ops/broadphase.candidate_lists
switches to (block, N) chunks above 2048 bodies — the O(N^2)-memory fix)
against an independent numpy reimplementation of the selection.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avbd3d_tpu.config import SolverParams
from avbd3d_tpu.models.scenes import SceneBuilder
from avbd3d_tpu.ops.broadphase import INT32_MAX, INT32_MIN, candidate_lists
from avbd3d_tpu.solver import step


def _grid_scene(n_cubes: int, min_bodies: int, spread: float = 3.0):
    """Ground + separated cubes (body-ground contacts only: the grid tier's
    carried-geometry lag is exactly zero against static partners, so the
    grid and xla backends must track tightly)."""
    sb = SceneBuilder()
    sb.add_body((100, 1, 100), 0.0, 0.5, (0, -0.5, 0))
    side = int(np.ceil(np.sqrt(n_cubes)))
    for i in range(n_cubes):
        x = (i % side - side / 2) * spread
        z = (i // side - side / 2) * spread
        sb.add_body((1, 1, 1), 1.0, 0.5, (x, 3.0 + 0.01 * i, z))
    return sb.build(SolverParams(), max_degree=4, min_bodies=min_bodies)


@pytest.mark.slow
def test_grid_multiblock_matches_xla():
    # 3072 capacity => G=24, gb=8 => THREE grid blocks (the multi-block
    # decomposition is the thing under test; n_real stays small for CPU
    # feasibility).
    world, params, cap, n_real = _grid_scene(12, 3072)
    assert world.bodies.g == 24
    capg = cap.replace(backend="grid")
    capx = cap.replace(backend="xla")
    wg = wx = world
    for _ in range(40):
        wg = step(wg, params, capg)
        wx = step(wx, params, capx)
    drift = float(jnp.max(jnp.abs(wg.bodies.pos - wx.bodies.pos)))
    assert drift < 2e-3, f"grid-vs-xla drift {drift:.2e}"
    for w in (wg, wx):
        d = jax.device_get(w.diagnostics)
        assert float(d.max_penetration) < 0.01
        assert int(d.sanitized) == 0
        assert int(d.pair_overflow) == 0
    dg = jax.device_get(wg.diagnostics)
    dx = jax.device_get(wx.diagnostics)
    assert int(dg.active_manifolds) == int(dx.active_manifolds)
    assert int(dg.active_contacts) == int(dx.active_contacts)


@pytest.mark.slow
def test_grid_pile_envelope():
    # A small pile (body-body contacts: exercises the carried-geometry lag)
    # must stay stable under the grid tier.
    sb = SceneBuilder()
    sb.add_body((100, 1, 100), 0.0, 0.5, (0, -0.5, 0))
    for i in range(6):
        sb.add_body((1, 1, 1), 1.0, 0.5, (0.02 * i, 0.55 + 1.02 * i, 0))
    world, params, cap, _ = sb.build(SolverParams(), max_degree=8,
                                     min_bodies=3072)
    capg = cap.replace(backend="grid")
    for _ in range(60):
        world = step(world, params, capg)
    d = jax.device_get(world.diagnostics)
    assert float(d.max_penetration) <= 0.0055
    assert int(d.sanitized) == 0
    ys = np.asarray(world.bodies.pos_n3[1:7, 1])
    expected = 0.51 + 1.01 * np.arange(6)
    assert np.all(np.abs(ys - expected) < 0.15), ys


def test_blocked_candidate_lists_match_numpy():
    # Above ``block_rows`` bodies candidate_lists switches to row-blocked
    # (block, N) evaluation.  Two checks, both modulo +-1 gap-quantization
    # step: (1) blocked vs the unblocked JAX evaluation — same ops and
    # global key-packing constants, but XLA codegen (fma contraction,
    # remote-AOT vs local executables) differs across the two shapes by
    # ~1 ulp in sqrt/fma, which can flip the int quantization of a slot's
    # key (observed ~0.1% of slots); (2) an independent full-matrix numpy
    # reimplementation of the documented selection semantics.
    rng = np.random.default_rng(11)
    g, d = 24, 4
    n = g * 128
    n_real = 500
    margin = 0.04
    pos = np.zeros((n, 3), np.float32)
    pos[:n_real] = rng.uniform(-6, 6, (n_real, 3)).astype(np.float32)
    pos[n_real:, 1] = -1e6
    radius = np.full(n, -1e9, np.float32)
    radius[:n_real] = rng.uniform(0.5, 1.2, n_real).astype(np.float32)
    # Identity quats: world half-extents == body half-extents, so the numpy
    # AABB model below needs no rotation handling.
    half = np.zeros((n, 3), np.float32)
    half[:n_real] = rng.uniform(0.3, 0.9, (n_real, 3)).astype(np.float32)
    quat = np.zeros((n, 4), np.float32)
    quat[:, 3] = 1.0
    dynamic = np.zeros(n, bool)
    dynamic[:n_real] = rng.random(n_real) < 0.8

    pos_cg = jnp.asarray(pos.T.reshape(3, g, 128))
    quat_cg = jnp.asarray(quat.T.reshape(4, g, 128))
    half_cg = tuple(jnp.asarray(half[:, k].reshape(g, 128)) for k in range(3))
    args = (
        pos_cg, quat_cg, half_cg, jnp.asarray(radius.reshape(g, 128)),
        jnp.asarray(dynamic.reshape(g, 128)),
        jnp.zeros((0, g, 128), jnp.int32), d, margin,
    )
    fn = jax.jit(candidate_lists, static_argnames=("degree", "block_rows"))
    nb, key, thr, cand, slack = fn(*args)            # blocked (n > 2048)
    nb_u, key_u, thr_u, cand_u, slack_u = fn(*args, block_rows=n)

    # ---- (1) blocked vs unblocked JAX: equal modulo quantization flips ----
    dku = np.asarray(key).astype(np.int64) - np.asarray(key_u).astype(np.int64)
    assert np.all((dku == 0) | (np.abs(dku) == n)), "non-quantization key diff"
    assert (dku != 0).mean() < 0.01, f"{(dku != 0).sum()} quantization flips"
    dtu = np.asarray(thr).astype(np.int64) - np.asarray(thr_u).astype(np.int64)
    assert np.all((dtu == 0) | (np.abs(dtu) == n))
    flip_cols = np.nonzero(np.abs(dku.reshape(d, n)).sum(0) != 0)[0]
    clean_u = np.setdiff1d(np.arange(n), flip_cols)
    np.testing.assert_array_equal(
        np.asarray(nb).reshape(d, n)[:, clean_u],
        np.asarray(nb_u).reshape(d, n)[:, clean_u],
    )
    assert abs(int(cand) - int(cand_u)) <= max(4, int(0.01 * int(cand_u)))
    np.testing.assert_allclose(float(slack), float(slack_u), rtol=1e-5)

    # ---- independent numpy selection (Chebyshev AABB gap) ----
    gap = np.max(
        np.abs(pos[:, None, :] - pos[None, :, :])
        - (half[:, None, :] + half[None, :, :]),
        axis=-1,
    ).astype(np.float32) - np.float32(margin)
    rsum = (radius[:, None] + radius[None, :] + np.float32(margin)).astype(np.float32)
    ii, jj = np.indices((n, n))
    mask = (gap <= 0) & (rsum > margin) & (ii != jj) & dynamic[:, None]
    q_max = (2**31 - 1) // n - 1
    max_wh = half.max()
    gap_range = np.float32(max(2.0 * max_wh + margin, 1e-6))
    q = np.clip((gap + gap_range) * np.float32(q_max / gap_range), 0.0,
                float(q_max)).astype(np.int64).astype(np.int32)
    keys_np = q * n + jj
    score = np.where(mask, -keys_np, np.int32(INT32_MIN))
    order = np.argsort(-score, axis=1, kind="stable")[:, :d]
    vals = np.take_along_axis(score, order, axis=1)
    valid = vals > int(INT32_MIN)
    nb_np = np.where(valid, order, -1)
    key_np = np.where(valid, -vals, 0)
    last = vals[:, d - 1]
    thr_np = np.where(last > int(INT32_MIN), -last, np.int32(INT32_MAX))
    slack_mask = dynamic[:, None] & ~dynamic[None, :] & (rsum > margin) \
        & (gap > 0) & (ii != jj)
    slack_np = gap[slack_mask].min() if slack_mask.any() else 1e9

    # ---- (2) vs numpy: equal modulo +-1 quantization step ----
    key_j = np.asarray(key).reshape(d, n).T.astype(np.int64)
    dk = key_j - key_np.astype(np.int64)
    assert np.all((dk == 0) | (np.abs(dk) == n)), "non-quantization key diff"
    assert (dk != 0).mean() < 0.01, f"{(dk != 0).sum()} quantization flips"
    thr_j = np.asarray(thr).reshape(n).astype(np.int64)
    dthr = thr_j - thr_np.astype(np.int64)
    assert np.all((dthr == 0) | (np.abs(dthr) == n))
    assert int(cand) == int(mask.sum())
    np.testing.assert_allclose(float(slack), slack_np, rtol=1e-5)
    # nb ordering: unique keys make selection exact wherever no key flipped.
    nb_j = np.asarray(nb).reshape(d, n).T
    clean = np.setdiff1d(np.arange(n), np.unique(np.nonzero(dk)[0]))
    np.testing.assert_array_equal(nb_j[clean], nb_np[clean])
