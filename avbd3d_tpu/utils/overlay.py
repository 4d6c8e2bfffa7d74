"""Render-overlay extraction: contact points, normal rays, joint/spring lines.

Reproduces the reference's debug-draw semantics on host-side numpy state:

- contact midpoints colored by stick state — yellow sticking, purple
  sliding — plus a red normal ray of length 0.5 from the midpoint
  (manifold.cpp:273-307);
- joint anchor-to-anchor lines in green (joint.cpp:141-161);
- spring anchor-to-anchor lines in blue (spring.cpp:92-109).

Used by the OBJ exporter (utils/export.py) and the interactive viewer
(avbd3d_tpu.viewer).
"""

from __future__ import annotations

import numpy as np

COLOR_STICK = (1.0, 1.0, 0.0)
COLOR_SLIDE = (0.8, 0.2, 0.8)
COLOR_NORMAL = (1.0, 0.2, 0.2)
COLOR_JOINT = (0.2, 0.8, 0.2)
COLOR_SPRING = (0.2, 0.2, 0.9)


def _rot_np(quat):
    x, y, z, w = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    return np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


def contact_overlay(world):
    """Active contact points (deduped to one replica per pair).

    Returns (mid (K, 3), normal (K, 3), stick (K,) bool)."""
    pos = np.asarray(world.bodies.pos_n3)
    quat = np.asarray(world.bodies.quat_n4)
    dyn = np.asarray(world.bodies.dynamic).reshape(-1)
    rot = _rot_np(quat)

    other = np.asarray(world.contacts.other)          # (D, G, 128)
    count = np.asarray(world.contacts.count)
    r_a = np.asarray(world.contacts.r_a)              # (4, 3, D, G, 128)
    r_b = np.asarray(world.contacts.r_b)
    normal = np.asarray(world.contacts.normal)        # (3, D, G, 128)
    stick = np.asarray(world.contacts.stick)          # (4, D, G, 128)

    d, g, _ = other.shape
    n = g * 128
    own = np.arange(n).reshape(g, 128)[None].repeat(d, 0)
    valid = other >= 0
    partner_static = ~dyn[np.where(valid, other, 0)]
    once = valid & ((own < other) | partner_static)

    mids, normals, sticks = [], [], []
    idx = np.argwhere(once)
    for (dd, gg, ll) in idx:
        body = gg * 128 + ll
        oth = other[dd, gg, ll]
        # Slot data is stored in the canonical pair frame: A = lower index.
        a, bb = (body, oth) if body < oth else (oth, body)
        nrm = normal[:, dd, gg, ll]
        for s in range(count[dd, gg, ll]):
            pa = pos[a] + rot[a] @ r_a[s, :, dd, gg, ll]
            pb = pos[bb] + rot[bb] @ r_b[s, :, dd, gg, ll]
            mids.append((pa + pb) * 0.5)
            normals.append(nrm)
            sticks.append(bool(stick[s, dd, gg, ll]))
    if not mids:
        return np.zeros((0, 3)), np.zeros((0, 3)), np.zeros((0,), bool)
    return np.asarray(mids), np.asarray(normals), np.asarray(sticks)


def joint_overlay(world):
    """Joint anchor lines (pA, pB) per active joint, (J, 2, 3)."""
    j = world.joints
    if j.j == 0:
        return np.zeros((0, 2, 3))
    pos = np.asarray(world.bodies.pos_n3)
    quat = np.asarray(world.bodies.quat_n4)
    rot = _rot_np(quat)
    body_a = np.asarray(j.body_a)
    body_b = np.asarray(j.body_b)
    r_a = np.asarray(j.r_a)
    r_b = np.asarray(j.r_b)
    active = np.asarray(j.active)
    out = []
    for k in range(body_b.shape[0]):
        if not active[k]:
            continue
        if body_a[k] >= 0:
            pa = pos[body_a[k]] + rot[body_a[k]] @ r_a[k]
        else:
            pa = r_a[k]
        pb = pos[body_b[k]] + rot[body_b[k]] @ r_b[k]
        out.append((pa, pb))
    return np.asarray(out) if out else np.zeros((0, 2, 3))


def spring_overlay(world):
    """Spring anchor lines (S, 2, 3)."""
    s = world.springs
    if s.s == 0:
        return np.zeros((0, 2, 3))
    pos = np.asarray(world.bodies.pos_n3)
    quat = np.asarray(world.bodies.quat_n4)
    rot = _rot_np(quat)
    body_a = np.asarray(s.body_a)
    body_b = np.asarray(s.body_b)
    r_a = np.asarray(s.r_a)
    r_b = np.asarray(s.r_b)
    active = np.asarray(s.active)
    out = []
    for k in range(body_b.shape[0]):
        if not active[k]:
            continue
        if body_a[k] >= 0:
            pa = pos[body_a[k]] + rot[body_a[k]] @ r_a[k]
        else:
            pa = r_a[k]
        pb = pos[body_b[k]] + rot[body_b[k]] @ r_b[k]
        out.append((pa, pb))
    return np.asarray(out) if out else np.zeros((0, 2, 3))
