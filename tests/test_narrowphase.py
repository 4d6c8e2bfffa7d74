"""Unit tests for the vmapped SAT narrowphase (reference collision.cpp)."""

import math

import numpy as np
import jax.numpy as jnp

from avbd3d_tpu.ops.narrowphase import collide_pairs


def _pair(pos_a, quat_a, size_a, pos_b, quat_b, size_b):
    pos = jnp.asarray([pos_a, pos_b], jnp.float32)
    quat = jnp.asarray([quat_a, quat_b], jnp.float32)
    size = jnp.asarray([size_a, size_b], jnp.float32)
    return collide_pairs(
        pos, quat, size,
        jnp.asarray([0]), jnp.asarray([1]), jnp.asarray([True]),
    )


IDENT = (0.0, 0.0, 0.0, 1.0)


def test_resting_cube_on_slab_four_contacts():
    out = _pair((0, -0.5, 0), IDENT, (100, 1, 100), (0, 0.5, 0), IDENT, (1, 1, 1))
    assert int(out["count"][0]) == 4
    # Normal is B->A: cube above slab -> normal points down.
    np.testing.assert_allclose(np.asarray(out["normal"][0, 0]), [0, -1, 0], atol=1e-6)
    # Contacts at the cube's bottom corners (body-local on B).
    rb = np.sort(np.asarray(out["r_b"][0]).round(4), axis=0)
    assert np.allclose(np.abs(rb[:, 0]), 0.5, atol=1e-4)
    assert np.allclose(rb[:, 1], -0.5, atol=1e-4)


def test_separated_boxes_no_contact():
    out = _pair((0, 0, 0), IDENT, (1, 1, 1), (0, 5, 0), IDENT, (1, 1, 1))
    assert int(out["count"][0]) == 0
    assert not bool(out["slot_ok"][0].any())


def test_gap_within_persistence_margin_keeps_contact():
    # 0.015 gap < 0.02 margin: the reference keeps near contacts alive
    # (collision.cpp:231-234).
    out = _pair((0, 0, 0), IDENT, (1, 1, 1), (0, 1.015, 0), IDENT, (1, 1, 1))
    assert int(out["count"][0]) == 4


def test_gap_beyond_margin_drops_contact():
    out = _pair((0, 0, 0), IDENT, (1, 1, 1), (0, 1.05, 0), IDENT, (1, 1, 1))
    assert int(out["count"][0]) == 0


def test_offset_overlap_reduced_patch():
    # Half-overlapping cubes: the contact patch is the 0.5 x 1 overlap strip.
    out = _pair((0, 0, 0), IDENT, (1, 1, 1), (0.5, 0.95, 0.0), IDENT, (1, 1, 1))
    assert int(out["count"][0]) == 4
    xs = np.asarray(out["r_b"][0])[:, 0]
    # Contact x range within B-local [-0.5, 0]: the strip over body A.
    assert xs.min() >= -0.51 and xs.max() <= 0.01


def test_edge_edge_contact():
    # Two 45-degree "roof ridges" crossed at right angles: cube A rotated
    # about x (top ridge along x), cube B above rotated about z (bottom
    # ridge along z).  The cross(x_edge, z_edge) axis separates least ->
    # the edge path must win (collision.cpp:459-472).
    qx = (math.sin(math.pi / 8), 0.0, 0.0, math.cos(math.pi / 8))
    qz = (0.0, 0.0, math.sin(math.pi / 8), math.cos(math.pi / 8))
    h = 2 * (math.sqrt(2) / 2) - 0.01  # ridges overlap by 0.01
    out = _pair((0, 0, 0), qx, (1, 1, 1), (0, h, 0), qz, (1, 1, 1))
    count = int(out["count"][0])
    assert count == 1  # edge path yields exactly one contact
    feat = int(out["feature"][0, 0])
    assert (feat >> 24) == 2  # AXIS_EDGE prefix (collision.cpp:412)
    # Contact normal is vertical (B->A points down).
    np.testing.assert_allclose(
        np.asarray(out["normal"][0, 0]), [0, -1, 0], atol=1e-5
    )


def test_feature_key_layout_face():
    out = _pair((0, -0.5, 0), IDENT, (1, 1, 1), (0, 0.5, 0), IDENT, (1, 1, 1))
    feat = np.asarray(out["feature"][0])
    ok = feat[feat >= 0]
    assert len(ok) == 4
    # type FACE_A(0) or FACE_B(1), refAxis 1 (y), incAxis 1.
    for f in ok:
        assert (f >> 24) in (0, 1)
        assert ((f >> 16) & 0xFF) == 1
        assert ((f >> 8) & 0xFF) == 1
        # 16x16 quantized uv in low byte
        assert 0 <= (f & 0xFF) <= 255


def test_deterministic_repeat():
    a = _pair((0, 0, 0), IDENT, (1, 1, 1), (0.3, 0.9, 0.1), IDENT, (1, 1, 1))
    b = _pair((0, 0, 0), IDENT, (1, 1, 1), (0.3, 0.9, 0.1), IDENT, (1, 1, 1))
    np.testing.assert_array_equal(np.asarray(a["feature"]), np.asarray(b["feature"]))
    np.testing.assert_array_equal(np.asarray(a["r_a"]), np.asarray(b["r_a"]))
