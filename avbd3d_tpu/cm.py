"""Component-major math: vectors as tuples of (B,)-shaped component arrays.

TPU VPU tiles are (8 sublanes, 128 lanes); an array shaped (P, 3) wastes
125/128 lanes on its minor dimension and every vector op becomes its own
padded kernel.  The TPU-native layout keeps the BIG axis (pairs/bodies) in
the minor-most dimension and unrolls the 3/4 vector components at the Python
level: a "vec3" is a tuple (x, y, z) of (P,) arrays, a "quat" is
(x, y, z, w).  All arithmetic then fuses into long elementwise chains over
fully-utilized lanes.

These helpers mirror maths.py one-to-one; maths.py remains the reference
implementation for tests and non-hot paths.
"""

from __future__ import annotations

import jax.numpy as jnp

VEC_EPS = 1e-6


def v3(x, y, z):
    return (x, y, z)


def splat(arr_last3):
    """(..., 3) -> component tuple."""
    return (arr_last3[..., 0], arr_last3[..., 1], arr_last3[..., 2])


def splat4(arr_last4):
    return (arr_last4[..., 0], arr_last4[..., 1], arr_last4[..., 2], arr_last4[..., 3])


def unsplat(v):
    return jnp.stack(v, axis=-1)


def add(a, b):
    return tuple(x + y for x, y in zip(a, b))


def sub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def scale(a, s):
    return tuple(x * s for x in a)


def neg(a):
    return tuple(-x for x in a)


def dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def length_sq(a):
    return dot(a, a)


def length(a):
    return jnp.sqrt(length_sq(a))


def where(c, a, b):
    return tuple(jnp.where(c, x, y) for x, y in zip(a, b))


def bwhere(c, a, b):
    """Boolean-valued select as pure logic ops (Mosaic cannot lower
    select_n on i1 payloads)."""
    return (c & a) | (~c & b)


def select_idx(a, idx):
    """Gather each component with the same index array."""
    return tuple(x[idx] for x in a)


def normalize_or(a, fallback):
    lsq = length_sq(a)
    bad = lsq < VEC_EPS
    inv = jnp.where(bad, 0.0, 1.0 / jnp.sqrt(jnp.where(bad, 1.0, lsq)))
    return tuple(jnp.where(bad, f, x * inv) for x, f in zip(a, fallback))


def q_rotate(q, v):
    """Rotate vec3 tuple by quat tuple: v + 2w(qv x v) + 2 qv x (qv x v)."""
    qv = (q[0], q[1], q[2])
    t = scale(cross(qv, v), 2.0)
    return add(add(v, scale(t, q[3])), cross(qv, t))


def q_rotate_inv(q, v):
    return q_rotate((-q[0], -q[1], -q[2], q[3]), v)


def q_mul(a, b):
    x1, y1, z1, w1 = a
    x2, y2, z2, w2 = b
    return (
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    )


def q_axes(q):
    """Box axes from a quat: returns (ax0, ax1, ax2), each a vec3 tuple.

    ax_k is the world direction of the body-local axis k (column k of the
    rotation matrix, maths.h:88)."""
    x, y, z, w = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    ax0 = (1 - 2 * (yy + zz), 2 * (xy + wz), 2 * (xz - wy))
    ax1 = (2 * (xy - wz), 1 - 2 * (xx + zz), 2 * (yz + wx))
    ax2 = (2 * (xz + wy), 2 * (yz - wx), 1 - 2 * (xx + yy))
    return ax0, ax1, ax2
