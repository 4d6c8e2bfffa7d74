"""Host-side simulation of per-body-slack refresh rules (cadence only).

The cascade refresh storm (169/200, tools/cascade_probe.py) is driven by a
few outliers: ejected bodies flying/spinning fast whose candidate gaps are
meters.  The uniform rule charges every body the same margin/2 budget; a
per-body budget from each body's own nearest NON-candidate gap would let
outliers roam.  This script replays the Stress1000 cascade and counts the
refresh cadence under candidate-superset-preserving variants:

  uniform    dev_i + chord_i > margin/2 (the shipped rule)
  slack      dev_i + chord_i > s_mm_i/2  or raw_i + chord_i > s_ms_i
             (s_*_i = body i's min anchor gap to a non-candidate
             dynamic/static body, floored at margin)
  slack+sph  same, with SPHERE selection extents (chord term drops: a
             sphere's center-gap test is rotation-invariant)

All rules are exact-superset-preserving, so the trajectory is identical —
only the would-be refresh cadence differs.  Usage: python tools/refresh_slack_sim.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np

from avbd3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from avbd3d_tpu import load_scene, run_steps  # noqa: E402
from avbd3d_tpu.solver import step  # noqa: E402


def q_axes_np(q):
    x, y, z, w = q
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y + z * w), 2 * (x * z - y * w)]),
        np.stack([2 * (x * y - z * w), 1 - 2 * (x * x + z * z), 2 * (y * z + x * w)]),
        np.stack([2 * (x * z + y * w), 2 * (y * z - x * w), 1 - 2 * (x * x + y * y)]),
    ])  # (3 axes, 3 comps, N)


def world_halves_np(quat, half):
    axes = q_axes_np(quat)     # (3, 3, N)
    return np.stack([
        sum(half[j] * np.abs(axes[j, k]) for j in range(3)) for k in range(3)
    ])


class Anchor:
    def __init__(self, sphere: bool):
        self.sphere = sphere
        self.pos = None

    def refresh(self, pos, quat, wh, rad, dyn, real, margin):
        n = pos.shape[1]
        self.pos, self.quat = pos.copy(), quat.copy()
        ext = np.broadcast_to(rad, (3, n)) if self.sphere else wh
        gap = np.max(
            np.abs(pos[:, :, None] - pos[:, None, :])
            - (ext[:, :, None] + ext[:, None, :]), axis=0,
        ) - margin
        np.fill_diagonal(gap, 1e9)
        pair_real = real[:, None] & real[None, :]
        noncand = (gap > 0.0) & pair_real
        dyn_col = dyn[None, :] & noncand
        sta_col = (~dyn[None, :]) & noncand
        self.s_mm = np.maximum(
            np.min(np.where(dyn_col, gap, 1e9), axis=1), margin)
        self.s_ms = np.maximum(
            np.min(np.where(sta_col, gap, 1e9), axis=1), margin)

    def fires(self, pos, quat, rad, dyn, uniform_margin=None):
        disp = pos - self.pos
        disp2 = (disp ** 2).sum(0)
        moved = dyn | (disp2 > 0)
        if self.sphere:
            chord = 0.0
        else:
            x, y, z, w = quat
            ax_, ay, az, aw = self.quat
            vx = w * (-ax_) + aw * x + (y * (-az) - z * (-ay))
            vy = w * (-ay) + aw * y + (z * (-ax_) - x * (-az))
            vz = w * (-az) + aw * z + (x * (-ay) - y * (-ax_))
            chord = 2 * np.minimum(np.sqrt(vx**2 + vy**2 + vz**2), 1.0) * np.maximum(rad, 0)
        nm = max(moved.sum(), 1)
        t = (disp * moved).sum(1) / nm
        dev = np.sqrt(((disp - t[:, None]) ** 2).sum(0)) + chord
        raw = np.sqrt(disp2) + chord
        if uniform_margin is not None:
            return (np.where(moved, dev, 0).max() > 0.5 * uniform_margin
                    or np.where(moved, raw, 0).max() > self.s_ms.min() + uniform_margin)
        return bool(
            np.any(moved & (dev > 0.5 * self.s_mm))
            or np.any(moved & (raw > self.s_ms))
        )


def main():
    sc = load_scene("Stress1000")
    w, p, c = sc.world, sc.params, sc.cap
    w = run_steps(w, p, c, 100)
    margin = p.bp_margin
    variants = {
        "slack m=.12 (sphere)": (Anchor(sphere=True), 0.12),
        "slack m=.20 (sphere)": (Anchor(sphere=True), 0.20),
        "slack m=.30 (sphere)": (Anchor(sphere=True), 0.30),
        "slack m=.20 (AABB+chord)": (Anchor(sphere=False), 0.20),
    }
    counts = dict.fromkeys(variants, 0)
    degree = {}
    for s in range(200):
        if s % 20 == 0:
            print(f"step {s}: {counts}", flush=True)
        pos = np.asarray(w.bodies.pos).reshape(3, -1)
        quat = np.asarray(w.bodies.quat).reshape(4, -1)
        rad = np.asarray(w.bodies.radius).reshape(-1)
        dyn = np.asarray(w.bodies.dynamic).reshape(-1)
        half = np.asarray(w.bodies.size).reshape(3, -1) * 0.5
        real = rad > 0
        wh = world_halves_np(quat, half)
        for name, (a, mg) in variants.items():
            if a.pos is None or a.fires(pos, quat, rad, dyn):
                a.refresh(pos, quat, wh, rad, dyn, real, mg)
                counts[name] += 1
                n = pos.shape[1]
                ext = np.broadcast_to(rad, (3, n)) if a.sphere else wh
                gap = np.max(
                    np.abs(pos[:, :, None] - pos[:, None, :])
                    - (ext[:, :, None] + ext[:, None, :]), axis=0) - mg
                np.fill_diagonal(gap, 1e9)
                cand = (gap <= 0) & (real[:, None] & real[None, :]) & dyn[:, None]
                degree.setdefault(name, []).append(int(cand.sum(1).max()))
        w = step(w, p, c)
    print("per-body-slack refresh cadence over the 200-step cascade:")
    print(f"  uniform (shipped, measured): 169/200")
    for name in variants:
        dg = degree.get(name, [0])
        print(f"  {name:28s}: {counts[name]}/200   max candidate degree {max(dg)}")


if __name__ == "__main__":
    main()
