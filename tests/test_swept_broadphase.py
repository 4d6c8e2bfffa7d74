"""Swept (sorted-axis window) broadphase vs the O(N²) matrix path.

``candidate_lists_swept`` must produce IDENTICAL candidate slots, selection
keys, and symmetric-filter thresholds to ``candidate_lists`` whenever its
exactness guard passes — it is a faster evaluation of the same selection,
not an approximation (ops/broadphase.py; SURVEY §2#4).  Tolerance: ±1
gap-quantization ulp flips from differing XLA codegen between the two
shapes, the same allowance as the row-blocked equivalence
(tests/test_grid_backend.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avbd3d_tpu.ops.broadphase import (
    candidate_lists,
    candidate_lists_swept,
)


def _random_world(rng, g, n_real, spread, fat_ground=True, static_frac=0.1,
                  excl_pairs=0):
    n = g * 128
    pos = np.zeros((n, 3), np.float32)
    pos[:n_real] = rng.uniform(-spread, spread, (n_real, 3)).astype(np.float32)
    pos[n_real:, 1] = -1e6
    radius = np.full(n, -1e9, np.float32)
    radius[:n_real] = rng.uniform(0.6, 1.1, n_real).astype(np.float32)
    half = np.zeros((n, 3), np.float32)
    half[:n_real] = rng.uniform(0.3, 0.8, (n_real, 3)).astype(np.float32)
    # Random orientations: the swept path must reproduce the world-AABB
    # (rotated-extent) gap expression bit-for-bit.
    quat = np.zeros((n, 4), np.float32)
    q = rng.normal(size=(n_real, 4)).astype(np.float32)
    quat[:n_real] = q / np.linalg.norm(q, axis=1, keepdims=True)
    quat[n_real:, 3] = 1.0
    dynamic = np.zeros(n, bool)
    dynamic[:n_real] = rng.random(n_real) >= static_frac
    if fat_ground:
        # A slab spanning the scene on two axes — forces the fat overlay.
        pos[0] = (0, -spread, 0)
        half[0] = (4 * spread, 0.5, 4 * spread)
        radius[0] = float(np.linalg.norm(half[0]))
        quat[0] = (0, 0, 0, 1)
        dynamic[0] = False
    e = max(excl_pairs and 2, 0)
    excl = np.full((e, n), -1, np.int32)
    if excl_pairs:
        used = np.zeros(n, np.int32)
        for _ in range(excl_pairs):
            i, j = rng.integers(1, n_real, 2)
            if i == j or used[i] >= e or used[j] >= e:
                continue
            excl[used[i], i] = j
            excl[used[j], j] = i
            used[i] += 1
            used[j] += 1

    def cg(a):
        return jnp.asarray(np.ascontiguousarray(a.T).reshape(a.shape[1], g, 128))

    return (
        cg(pos), cg(quat),
        tuple(jnp.asarray(half[:, k].reshape(g, 128)) for k in range(3)),
        jnp.asarray(radius.reshape(g, 128)),
        jnp.asarray(dynamic.reshape(g, 128)),
        jnp.asarray(excl.reshape(e, g, 128)),
    )


def _compare(args, degree, margin, window):
    nb_m, key_m, thr_m, cand_m, slack_m = jax.jit(
        candidate_lists, static_argnames=("degree",)
    )(*args, degree, margin)
    nb_s, key_s, thr_s, cand_s, slack_s = jax.jit(
        candidate_lists_swept, static_argnames=("degree", "margin", "window")
    )(*args, degree=degree, margin=margin, window=window)
    n = nb_m.shape[1] * 128
    dk = np.asarray(key_s).astype(np.int64) - np.asarray(key_m).astype(np.int64)
    assert np.all((dk == 0) | (np.abs(dk) == n)), "non-quantization key diff"
    assert (dk != 0).mean() < 0.01, f"{(dk != 0).sum()} quantization flips"
    dthr = np.asarray(thr_s).astype(np.int64) - np.asarray(thr_m).astype(np.int64)
    assert np.all((dthr == 0) | (np.abs(dthr) == n))
    flips = np.abs(dk).sum(axis=0) != 0
    clean = ~flips
    np.testing.assert_array_equal(
        np.asarray(nb_s)[:, clean], np.asarray(nb_m)[:, clean]
    )
    assert abs(int(cand_s) - int(cand_m)) <= max(4, int(0.01 * int(cand_m)))
    # slack: conservative (never larger than the matrix path's)
    assert float(slack_s) <= float(slack_m) + 1e-5


# Shapes are shared across tests (g=2, E=2, degree=8, window=64) so the
# two jitted paths compile ONCE on this 1-core CPU host and every further
# case hits the compile cache; coverage comes from seeds, not shapes.
_G, _D, _W = 2, 8, 64


def test_swept_matches_matrix_dense():
    rng = np.random.default_rng(7)
    args = _random_world(rng, g=_G, n_real=170, spread=7.0, excl_pairs=1)
    _compare(args, degree=_D, margin=0.04, window=_W)


def test_swept_matches_matrix_with_exclusions_and_statics():
    rng = np.random.default_rng(19)
    args = _random_world(rng, g=_G, n_real=150, spread=6.5, static_frac=0.3,
                         excl_pairs=20)
    _compare(args, degree=_D, margin=0.04, window=_W)


def test_swept_guard_falls_back_when_window_too_small():
    # A window of 4 cannot cover a dense cluster: the guard must fire and
    # the fallback must return the exact matrix result.
    rng = np.random.default_rng(3)
    args = _random_world(rng, g=_G, n_real=160, spread=3.0, excl_pairs=1)
    _compare(args, degree=_D, margin=0.04, window=4)


def test_swept_guard_falls_back_on_dynamic_fat_body():
    rng = np.random.default_rng(5)
    (pos, quat, half, radius, dynamic, excl) = _random_world(
        rng, g=_G, n_real=120, spread=6.0, excl_pairs=1
    )
    # Make the slab dynamic: fat rows would miss slim partners, so the
    # guard must route to the matrix path (results stay identical).
    dynamic = dynamic.at[0, 0].set(True)
    _compare((pos, quat, half, radius, dynamic, excl), degree=_D,
             margin=0.04, window=_W)


@pytest.mark.parametrize("seed", [23, 29, 31])
def test_swept_fuzz(seed):
    rng = np.random.default_rng(seed)
    args = _random_world(
        rng, g=_G, n_real=int(rng.integers(100, 240)),
        spread=float(rng.uniform(4, 9)),
        static_frac=float(rng.uniform(0, 0.4)),
        excl_pairs=int(rng.integers(1, 15)),
    )
    _compare(args, degree=_D, margin=0.04, window=_W)
