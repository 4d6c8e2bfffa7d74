"""Falling-regime cascade probe (VERDICT r4 task 1).

Measures, on real hardware, where the Stress1000 landing-cascade time goes
and how candidate-cache tuning moves it:

1. refresh cadence: step 100->300 one step at a time, counting how often the
   scalar refresh gate (ops/broadphase.refresh_scalar) fires;
2. wall time of the 200-step cascade block (and the full 0-300 falling
   window) under config variants: bp_margin / max_degree / bp_window;
3. the safety envelope per variant: end-state maxPen + overflow counters and
   a stepwise maxPen scan over the cascade.

Usage:  python tools/cascade_probe.py [variant ...]
        (no args = the standard sweep)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from avbd3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from avbd3d_tpu import load_scene, run_steps  # noqa: E402
from avbd3d_tpu.solver import step  # noqa: E402


def _sync(w):
    return float(np.asarray(w.bodies.pos).sum())


def scene_variant(margin=None, degree=None, window=None, cache_degree=None):
    sc = load_scene("Stress1000")
    p, c = sc.params, sc.cap
    if margin is not None:
        p = p.replace(bp_margin=margin)
    if degree is not None or window is not None or cache_degree is not None:
        kw = {}
        if degree is not None:
            kw["max_degree"] = degree
        if window is not None:
            kw["bp_window"] = window
        if cache_degree is not None:
            kw["cache_degree"] = cache_degree
        c = c.replace(**kw)
    w = sc.world
    if degree is not None and degree != sc.cap.max_degree:
        # The bp cache carries (D, G, 128) slots — rebuild empty at new D.
        from avbd3d_tpu.ops.broadphase import empty_bp_cache

        w = w.replace(bp=empty_bp_cache(w.bodies.g, degree))
    return w, p, c


def refresh_cadence(w, p, c, lo=100, hi=300):
    """Count refresh-gate fires stepping one step at a time."""
    w = run_steps(w, p, c, lo)
    _sync(w)
    fires = 0
    margin = p.bp_margin
    for _ in range(hi - lo):
        dv = np.asarray(w.diagnostics.vec)
        slack = float(np.asarray(w.bp.slack))
        if dv[14] > 0.5 * margin or dv[15] > slack + margin:
            fires += 1
        w = step(w, p, c)
    _sync(w)
    return fires, hi - lo


def timed_blocks(w, p, c, label):
    # warm compile of each block length
    _sync(run_steps(w, p, c, 300))
    _sync(run_steps(w, p, c, 100))
    _sync(run_steps(w, p, c, 200))
    falling = []
    for _ in range(2):
        t0 = time.perf_counter()
        _sync(run_steps(w, p, c, 300))
        falling.append(time.perf_counter() - t0)
    w1 = run_steps(w, p, c, 100)
    _sync(w1)
    casc = []
    for _ in range(2):
        t0 = time.perf_counter()
        w2 = run_steps(w1, p, c, 200)
        _sync(w2)
        casc.append(time.perf_counter() - t0)
    # settle + envelope check: run on to step 700 and read diagnostics
    w3 = run_steps(w2, p, c, 400)
    d = jax.device_get(w3.diagnostics)
    print(
        f"{label:34s} falling {300 / min(falling):7.1f} sps "
        f"({300 / min(falling) / 44.1:5.1f}x)  cascade {200 / min(casc):7.1f} sps"
        f"  settledPen {float(d.max_penetration):.4f}"
        f" ovf {int(d.pair_overflow)}/{int(d.degree_overflow)}"
        f" san {int(d.sanitized)}"
    )
    return 300 / min(falling), 200 / min(casc)


def main():
    variants = [
        ("baseline m=.04 D=24", dict()),
        ("margin .08 D=28", dict(margin=0.08, degree=28)),
        ("margin .12 D=32", dict(margin=0.12, degree=32)),
        ("swept W=192", dict(window=192)),
        ("swept W=192 m=.08 D=28", dict(margin=0.08, degree=28, window=192)),
    ]
    names = sys.argv[1:]
    print(f"device={jax.devices()[0]}")
    w, p, c = scene_variant()
    fires, steps = refresh_cadence(w, p, c)
    print(f"refresh cadence (baseline, steps 100-300): {fires}/{steps}")
    for label, kw in variants:
        if names and not any(s in label for s in names):
            continue
        w, p, c = scene_variant(**kw)
        timed_blocks(w, p, c, label)


if __name__ == "__main__":
    main()
