"""Decompose the Stress1000 cascade's broadphase-refresh triggers.

For each step in the landing cascade, reports whether the refresh gate
would fire from the TRANSLATION part (|disp - t|) alone, from the CHORD
(rotation) part alone, or only combined — deciding whether rotation or
translation drives the 169/200 refresh cadence (tools/cascade_probe.py).

Usage:  python tools/refresh_decompose.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np

from avbd3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from avbd3d_tpu import load_scene, run_steps  # noqa: E402
from avbd3d_tpu.solver import step  # noqa: E402


def main():
    sc = load_scene("Stress1000")
    w, p, c = sc.world, sc.params, sc.cap
    w = run_steps(w, p, c, 100)
    margin = p.bp_margin
    counts = {"trans": 0, "chord": 0, "both": 0, "none": 0, "ms": 0}
    chord_max_hist = []
    for _ in range(200):
        pos = np.asarray(w.bodies.pos)          # (3, G, 128)
        quat = np.asarray(w.bodies.quat)
        rad = np.asarray(w.bodies.radius)
        dyn = np.asarray(w.bodies.dynamic)
        anchor = np.asarray(w.bp.anchor)
        aq = np.asarray(w.bp.anchor_quat)
        slack = float(np.asarray(w.bp.slack))
        disp = pos - anchor
        disp2 = (disp ** 2).sum(0)
        moved = dyn | (disp2 > 0)
        # chord = 2*|vec(q (x) qa*)|*radius
        x, y, z, ww_ = quat
        ax_, ay, az, aw = aq
        # q (x) conj(qa): vector part
        vx = ww_ * (-ax_) + aw * x + (y * (-az) - z * (-ay))
        vy = ww_ * (-ay) + aw * y + (z * (-ax_) - x * (-az))
        vz = ww_ * (-az) + aw * z + (x * (-ay) - y * (-ax_))
        svec = np.sqrt(vx ** 2 + vy ** 2 + vz ** 2)
        chord = 2.0 * np.minimum(svec, 1.0) * np.maximum(rad, 0.0)
        nm = max(moved.sum(), 1)
        t = (disp * moved).sum(axis=(1, 2)) / nm
        dev_t = np.sqrt(((disp - t[:, None, None]) ** 2).sum(0))
        half = 0.5 * margin
        fire_t = (np.where(moved, dev_t, 0.0)).max() > half
        fire_c = (np.where(moved, chord, 0.0)).max() > half
        fire_mm = (np.where(moved, dev_t + chord, 0.0)).max() > half
        raw = np.sqrt(disp2) + chord
        fire_ms = (np.where(moved, raw, 0.0)).max() > slack + margin
        if fire_mm or fire_ms:
            if fire_ms and not fire_mm:
                counts["ms"] += 1
            elif fire_t and not fire_c:
                counts["trans"] += 1
            elif fire_c and not fire_t:
                counts["chord"] += 1
            else:
                counts["both"] += 1
        else:
            counts["none"] += 1
        chord_max_hist.append((
            float(np.where(moved, chord, 0.0).max()),
            float(np.where(moved, dev_t, 0.0).max()),
        ))
        w = step(w, p, c)
    print("refresh trigger decomposition over steps 100-300:")
    print(f"  translation-only fires : {counts['trans']}")
    print(f"  chord(rotation)-only   : {counts['chord']}")
    print(f"  both exceed            : {counts['both']}")
    print(f"  mover-static (slack)   : {counts['ms']}")
    print(f"  no fire                : {counts['none']}")
    ch = np.array([h[0] for h in chord_max_hist])
    tr = np.array([h[1] for h in chord_max_hist])
    print(f"  max chord per step: mean {ch.mean():.4f}  p90 {np.percentile(ch, 90):.4f}  max {ch.max():.4f}  (budget margin/2 = {0.5 * margin})")
    print(f"  max dev_t per step: mean {tr.mean():.4f}  p50 {np.percentile(tr, 50):.4f}  p90 {np.percentile(tr, 90):.4f}  max {tr.max():.4f}")


if __name__ == "__main__":
    main()
