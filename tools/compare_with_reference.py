#!/usr/bin/env python
"""Behavioral parity report: C++ reference oracle vs avbd3d_tpu.

Runs the same scenes through the freshly-built reference binary (see
tools/build_reference_oracle.sh) and this engine, and prints the
diagnostics envelopes side by side.  Parity is behavioral (settling,
penetration vs slop, contact-graph size), not bitwise — SURVEY.md section 7
explains why bitwise equality is unattainable (iteration order, f32
reassociation).

Usage:  python tools/compare_with_reference.py [Scene ...]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avbd3d_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from avbd3d_tpu import load_scene, run_steps  # noqa: E402

ORACLE = os.environ.get("ORACLE_BIN", "/tmp/avbd_oracle/ref_headless")
STEPS = {"TwoBlockDrop": 300, "Stack": 300, "Pyramid": 300, "Wall": 300,
         "Stress1000": 600}


def run_oracle(scene: str, steps: int):
    out = subprocess.run(
        [ORACLE, "--scene", scene, "--steps", str(steps), "--log-every", str(steps)],
        capture_output=True, text=True, check=True,
    ).stdout
    m = re.search(
        r"ORACLE step \d+ mf (\d+) ct (\d+) maxPen ([\d.]+) maxLin ([\d.]+) "
        r"maxAng ([\d.]+) miny (-?[\d.]+) below (\d+)", out)
    keys = ("mf", "ct", "maxPen", "maxLin", "maxAng", "miny", "below")
    return dict(zip(keys, [float(x) for x in m.groups()]))


def run_ours(scene_name: str, steps: int):
    scene = load_scene(scene_name)
    w, p, c = scene.world, scene.params, scene.cap
    done = 0
    while done < steps:
        block = min(100, steps - done)
        w = run_steps(w, p, c, block)
        done += block
    float(np.asarray(w.bodies.pos).sum())
    d = jax.device_get(w.diagnostics)
    ys = np.asarray(w.bodies.pos_n3[1:scene.n_real, 1]) if scene.n_real > 1 else np.asarray([0.0])
    return {
        "mf": int(d.active_manifolds), "ct": int(d.active_contacts),
        "maxPen": float(d.max_penetration), "maxLin": float(d.max_linear_speed),
        "maxAng": float(d.max_angular_speed),
        "miny": float(ys.min()), "below": int((ys < -0.1).sum()),
    }


def main():
    scenes = sys.argv[1:] or list(STEPS)
    print(f"{'scene':14s} {'':7s} {'mf':>6s} {'ct':>6s} {'maxPen':>8s} "
          f"{'maxLin':>8s} {'maxAng':>8s} {'miny':>8s} {'below':>6s}")
    for s in scenes:
        steps = STEPS.get(s, 300)
        ref = run_oracle(s, steps)
        ours = run_ours(s, steps)
        for tag, row in (("C++", ref), ("tpu", ours)):
            print(f"{s:14s} {tag:7s} {int(row['mf']):6d} {int(row['ct']):6d} "
                  f"{row['maxPen']:8.4f} {row['maxLin']:8.2f} "
                  f"{row['maxAng']:8.2f} {row['miny']:8.2f} {int(row['below']):6d}")
        print()


if __name__ == "__main__":
    main()
