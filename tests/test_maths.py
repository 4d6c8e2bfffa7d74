"""Unit tests for the batched math layer against numpy references."""

import numpy as np
import jax.numpy as jnp

from avbd3d_tpu import maths


def _rand_quat(rng, n):
    q = rng.normal(size=(n, 4))
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def test_quat_mul_matches_rotation_composition():
    rng = np.random.default_rng(0)
    q1 = _rand_quat(rng, 64)
    q2 = _rand_quat(rng, 64)
    v = rng.normal(size=(64, 3)).astype(np.float32)
    lhs = maths.quat_rotate(maths.quat_mul(jnp.asarray(q1), jnp.asarray(q2)), jnp.asarray(v))
    rhs = maths.quat_rotate(jnp.asarray(q1), maths.quat_rotate(jnp.asarray(q2), jnp.asarray(v)))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_quat_to_mat3_matches_rotate():
    rng = np.random.default_rng(1)
    q = _rand_quat(rng, 64)
    v = rng.normal(size=(64, 3)).astype(np.float32)
    r = maths.quat_to_mat3(jnp.asarray(q))
    lhs = np.einsum("nij,nj->ni", np.asarray(r), v)
    rhs = np.asarray(maths.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_quat_rotate_inv_roundtrip():
    rng = np.random.default_rng(2)
    q = _rand_quat(rng, 32)
    v = rng.normal(size=(32, 3)).astype(np.float32)
    out = maths.quat_rotate_inv(jnp.asarray(q), maths.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(np.asarray(out), v, atol=1e-5)


def test_solve3_matches_numpy():
    rng = np.random.default_rng(3)
    m = rng.normal(size=(128, 3, 3)).astype(np.float32)
    a = np.einsum("nij,nkj->nik", m, m) + 0.1 * np.eye(3)  # SPD
    b = rng.normal(size=(128, 3)).astype(np.float32)
    x = np.asarray(maths.solve3(jnp.asarray(a), jnp.asarray(b)))
    expected = np.linalg.solve(a.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x, expected, rtol=2e-3, atol=2e-4)


def test_solve3_degenerate_returns_zero():
    a = jnp.zeros((4, 3, 3))
    b = jnp.ones((4, 3))
    x = np.asarray(maths.solve3(a, b))
    np.testing.assert_array_equal(x, np.zeros((4, 3)))


def test_solve66_matches_numpy():
    # Physics-like conditioning: strong mass/dt^2 diagonal plus penalty
    # rank-1 terms (the regime solver.cpp:344-409 produces).
    rng = np.random.default_rng(4)
    m = rng.normal(size=(64, 6, 6)).astype(np.float32)
    a = np.einsum("nij,nkj->nik", m, m) + 50.0 * np.eye(6)  # SPD, dominant diag
    b = rng.normal(size=(64, 6)).astype(np.float32)
    x_l, x_a = maths.solve66(
        jnp.asarray(a[:, :3, :3]), jnp.asarray(a[:, :3, 3:]),
        jnp.asarray(a[:, 3:, :3]), jnp.asarray(a[:, 3:, 3:]),
        jnp.asarray(b[:, :3]), jnp.asarray(b[:, 3:]),
    )
    x = np.concatenate([np.asarray(x_l), np.asarray(x_a)], axis=-1)
    expected = np.linalg.solve(a.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x, expected, rtol=5e-3, atol=5e-4)


def test_quat_vec_doubled_sign_correction():
    q = jnp.asarray([[0.1, 0.2, 0.3, -0.9], [0.1, 0.2, 0.3, 0.9]], jnp.float32)
    out = np.asarray(maths.quat_vec_doubled(q))
    np.testing.assert_allclose(out[0], -out[1], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.2, 0.4, 0.6], atol=1e-6)


def test_normalize_zero_safe():
    v = jnp.zeros((3, 3))
    np.testing.assert_array_equal(np.asarray(maths.normalize(v)), np.zeros((3, 3)))
