"""Batched 3D math primitives (L0 of the engine).

TPU-native rebuild of the reference math layer (``source/maths.h``): instead
of scalar ``vec3``/``quat``/``mat3`` structs, everything here operates on
batched ``jnp`` arrays with trailing dims ``(..., 3)`` for vectors,
``(..., 4)`` for quaternions stored ``(x, y, z, w)`` (same component order as
``maths.h:55-68``), and ``(..., 3, 3)`` for matrices.  All functions are pure,
jit/vmap-friendly, and float32.

The 3x3 LDL solve (reference ``maths.h:104``) and the 6x6 Schur-complement
solve (reference ``solver.cpp:68-83``) are implemented branch-free with
epsilon-guarded pivots so they vectorize over thousands of bodies.
"""

from __future__ import annotations

import jax.numpy as jnp

# Matches FLT_EPSILON guards in the reference LDL solve (maths.h:104).
_PIVOT_EPS = 1.1920929e-07
# Matches VEC_EPSILON (maths.h:18).
VEC_EPS = 1e-6


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def length_sq(v):
    return jnp.sum(v * v, axis=-1)


def length(v):
    return jnp.sqrt(length_sq(v))


def normalize(v):
    """Safe normalize: returns 0 for near-zero vectors (maths.h:44)."""
    len_ = length(v)
    safe = jnp.where(len_ < VEC_EPS, 1.0, len_)
    return jnp.where((len_ < VEC_EPS)[..., None], 0.0, v / safe[..., None])


def normalize_or(v, fallback):
    """Normalize with an explicit fallback direction (manifold.cpp:30-37)."""
    lsq = length_sq(v)
    safe = jnp.sqrt(jnp.where(lsq < VEC_EPS, 1.0, lsq))
    unit = v / safe[..., None]
    return jnp.where((lsq < VEC_EPS)[..., None], fallback, unit)


def cross(a, b):
    return jnp.cross(a, b)


# ---------------------------------------------------------------------------
# Quaternions: (x, y, z, w), identity = (0, 0, 0, 1).
# ---------------------------------------------------------------------------

def quat_identity(shape=()):
    q = jnp.zeros(shape + (4,), jnp.float32)
    return q.at[..., 3].set(1.0)


def quat_mul(q1, q2):
    """Hamilton product, same layout as maths.h:67."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], q.dtype)


def quat_normalize(q):
    """Returns identity for degenerate quats (maths.h:65)."""
    msq = jnp.sum(q * q, axis=-1)
    safe = jnp.sqrt(jnp.where(msq < VEC_EPS, 1.0, msq))
    unit = q / safe[..., None]
    ident = jnp.zeros_like(q).at[..., 3].set(1.0)
    return jnp.where((msq < VEC_EPS)[..., None], ident, unit)


def quat_rotate(q, v):
    """Rotate vector by quaternion: v + 2 w (qv x v) + 2 qv x (qv x v)."""
    qv = q[..., :3]
    t = 2.0 * jnp.cross(qv, v)
    return v + q[..., 3:4] * t + jnp.cross(qv, t)


def quat_rotate_inv(q, v):
    return quat_rotate(quat_conj(q), v)


def quat_from_axis_angle(axis, angle):
    axis = jnp.asarray(axis, jnp.float32)
    half = jnp.asarray(angle, jnp.float32) * 0.5
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1
    )


def quat_to_mat3(q):
    """Rotation matrix (..., 3, 3) with columns matching maths.h:88."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    # Row-major assembly of the standard rotation matrix.
    r00 = 1 - 2 * (yy + zz)
    r01 = 2 * (xy - wz)
    r02 = 2 * (xz + wy)
    r10 = 2 * (xy + wz)
    r11 = 1 - 2 * (xx + zz)
    r12 = 2 * (yz - wx)
    r20 = 2 * (xz - wy)
    r21 = 2 * (yz + wx)
    r22 = 1 - 2 * (xx + yy)
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_vec_doubled(q):
    """2 * vector part, sign-corrected so w >= 0.

    This is the small-rotation axis-angle extraction the reference uses for
    rotational error and angular velocity reconstruction
    (solver.cpp:365-369, 446-449).
    """
    sign = jnp.where(q[..., 3] < 0.0, -1.0, 1.0)
    return 2.0 * q[..., :3] * sign[..., None]


def outer3(a, b):
    """Outer product a b^T with shape (..., 3, 3)."""
    return a[..., :, None] * b[..., None, :]


# ---------------------------------------------------------------------------
# Linear solves
# ---------------------------------------------------------------------------

def solve3(A, b):
    """Batched 3x3 LDL^T solve matching the reference semantics.

    Reference (maths.h:104) factorizes column-wise and returns the zero
    vector whenever a pivot magnitude drops below FLT_EPSILON.  Here the
    guards become masked selects so the whole batch stays branch-free.

    A: (..., 3, 3), b: (..., 3) -> (..., 3)
    """
    # The reference operates on columns; mirror it exactly using A[:, k] as
    # column k (A is symmetric in all call sites, so layout is moot, but we
    # keep the column convention for bit-level parity of the algorithm).
    c0 = A[..., :, 0]
    c1 = A[..., :, 1]
    c2 = A[..., :, 2]

    d0 = c0[..., 0]
    bad0 = jnp.abs(d0) < _PIVOT_EPS
    d0s = jnp.where(bad0, 1.0, d0)
    L10 = c0[..., 1] / d0s
    L20 = c0[..., 2] / d0s

    c1p = c1 - c0 * L10[..., None]
    d1 = c1p[..., 1]
    bad1 = jnp.abs(d1) < _PIVOT_EPS
    d1s = jnp.where(bad1, 1.0, d1)
    L21 = c1p[..., 2] / d1s

    c2p = c2 - c0 * L20[..., None] - c1p * L21[..., None]
    d2 = c2p[..., 2]
    bad2 = jnp.abs(d2) < _PIVOT_EPS
    d2s = jnp.where(bad2, 1.0, d2)

    # Forward substitution L y = b
    y0 = b[..., 0]
    y1 = b[..., 1] - L10 * y0
    y2 = b[..., 2] - L20 * y0 - L21 * y1
    # Diagonal
    z0 = y0 / d0s
    z1 = y1 / d1s
    z2 = y2 / d2s
    # Back substitution L^T x = z
    x2 = z2
    x1 = z1 - L21 * x2
    x0 = z0 - L10 * x1 - L20 * x2

    x = jnp.stack([x0, x1, x2], axis=-1)
    bad = bad0 | bad1 | bad2
    return jnp.where(bad[..., None], 0.0, x)


def solve33_matrix(A, B):
    """Solve A X = B for (..., 3, 3) B, column by column."""
    cols = [solve3(A, B[..., :, k]) for k in range(3)]
    return jnp.stack(cols, axis=-1)


def solve3_sym_cm(a, b):
    """Component-form 3x3 LDL^T solve for symmetric A.

    ``a`` = (xx, xy, xz, yy, yz, zz) upper-triangle component arrays,
    ``b`` = (b0, b1, b2).  Same algorithm and epsilon guards as solve3 /
    maths.h:104, but fully elementwise over arbitrary-shaped component
    arrays (no trailing (3, 3) dims — TPU lane-friendly).
    Returns (x0, x1, x2).
    """
    xx, xy, xz, yy, yz, zz = a
    bad0 = jnp.abs(xx) < _PIVOT_EPS
    d0 = jnp.where(bad0, 1.0, xx)
    l10 = xy / d0
    l20 = xz / d0
    d1_raw = yy - xy * l10
    bad1 = jnp.abs(d1_raw) < _PIVOT_EPS
    d1 = jnp.where(bad1, 1.0, d1_raw)
    l21 = (yz - xz * l10) / d1
    d2_raw = zz - xz * l20 - (yz - xz * l10) * l21
    bad2 = jnp.abs(d2_raw) < _PIVOT_EPS
    d2 = jnp.where(bad2, 1.0, d2_raw)

    y0 = b[0]
    y1 = b[1] - l10 * y0
    y2 = b[2] - l20 * y0 - l21 * y1
    z0 = y0 / d0
    z1 = y1 / d1
    z2 = y2 / d2
    x2 = z2
    x1 = z1 - l21 * x2
    x0 = z0 - l10 * x1 - l20 * x2
    bad = bad0 | bad1 | bad2
    zero = jnp.zeros_like(x0)
    return (
        jnp.where(bad, zero, x0),
        jnp.where(bad, zero, x1),
        jnp.where(bad, zero, x2),
    )


def solve66_cm(a_ll, a_la, a_aa, b_l, b_a):
    """Component-form 6x6 Schur solve (structure of solver.cpp:68-83).

    a_ll: 6 symmetric comps; a_la: 9 row-major comps ([i*3+j] = row i, col j);
    a_aa: 6 symmetric comps; b_l/b_a: 3 comps each.  A_al = A_la^T.
    Returns (dl (3,), da (3,)) component tuples.
    """
    # AinvB column j = A_ll^{-1} * A_la[:, j]
    cols = [
        solve3_sym_cm(a_ll, (a_la[0 + j], a_la[3 + j], a_la[6 + j]))
        for j in range(3)
    ]
    # AinvB[k][j] = cols[j][k]
    x0 = solve3_sym_cm(a_ll, b_l)
    # schur[i][j] = aa[i][j] - sum_k la[k*3+i] * AinvB[k][j]  (al = la^T)
    aa = {
        (0, 0): a_aa[0], (0, 1): a_aa[1], (0, 2): a_aa[2],
        (1, 1): a_aa[3], (1, 2): a_aa[4], (2, 2): a_aa[5],
    }
    schur = []
    for (i, j) in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)):
        s = aa[(i, j)]
        for k in range(3):
            s = s - a_la[k * 3 + i] * cols[j][k]
        schur.append(s)
    rhs_s = []
    for i in range(3):
        s = b_a[i]
        for k in range(3):
            s = s - a_la[k * 3 + i] * x0[k]
        rhs_s.append(s)
    y = solve3_sym_cm(tuple(schur), tuple(rhs_s))
    dl = tuple(x0[k] - sum(cols[j][k] * y[j] for j in range(3)) for k in range(3))
    return dl, y


def solve66(A_ll, A_la, A_al, A_aa, b_l, b_a):
    """Batched 6x6 block solve via Schur complement on the angular block.

    Mirrors the structure of the reference solve6x6 (solver.cpp:68-83):
      AinvB = A_ll^{-1} A_la        (three 3x3 LDL solves)
      x0    = A_ll^{-1} b_l
      S     = A_aa - A_al AinvB
      y     = S^{-1} (b_a - A_al x0)
      x     = x0 - AinvB y
    Returns (x_linear, y_angular), each (..., 3).
    """
    AinvB = solve33_matrix(A_ll, A_la)
    x0 = solve3(A_ll, b_l)
    schur = A_aa - jnp.einsum("...ik,...kj->...ij", A_al, AinvB)
    rhs_s = b_a - jnp.einsum("...ij,...j->...i", A_al, x0)
    y = solve3(schur, rhs_s)
    x = x0 - jnp.einsum("...ij,...j->...i", AinvB, y)
    return x, y
