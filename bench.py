"""Benchmark: Stress1000 steps/sec on the current JAX backend.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, "extra": {...}}

Baseline: the C++ reference measured at 19.9 steps/sec on the settled-regime
600-step Stress1000 run and 44.1 steps/sec on the 300-step falling regime
(single Xeon thread, see BASELINE.md).  The bench reproduces both regimes:

- falling: steps 0-300 from scene build (bodies raining onto the ground),
- settled: the steady-state pile (warmed past step 600), timed in blocks of
  500 steps — large blocks because a host->device dispatch through the axon
  tunnel costs ~26 ms, which would dominate smaller blocks.

The headline value is the settled-regime best-of-N block (the tunnel
occasionally stalls whole seconds; the best block reflects actual device
throughput); the sustained median across blocks is reported alongside.
"""

from __future__ import annotations

import json
import time

import numpy as np

from avbd3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from avbd3d_tpu import load_scene, run_steps  # noqa: E402

BASELINE_SETTLED = 19.9   # C++ single-thread, settled regime (BASELINE.md)
BASELINE_FALLING = 44.1   # C++ single-thread, falling regime (BASELINE.md)
# C++ (ref_stressn, same machine) at the capacity-scaling scene sizes —
# settled-regime steps/sec, best 100-step block after pile formation
# (favors the C++; see BASELINE.md "capacity scaling" for the full logs).
BASELINE_STRESS = {"Stress2048": 5.93, "Stress4096": 2.87}
BLOCK = 1000
TRIALS = 5


def _bench_capacity(name: str, warm: int, timed: int):
    """Settled-regime steps/sec for a capacity-scaling scene (fused Pallas
    at 2048; gridded tier at 4096).  Returns a dict for 'extra'."""
    sc = load_scene(name)
    w = sc.world
    t0 = time.perf_counter()
    w = run_steps(w, sc.params, sc.cap, warm)   # fall + land + settle
    _sync(w)
    warm_s = time.perf_counter() - t0
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        w = run_steps(w, sc.params, sc.cap, timed)
        _sync(w)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    d = jax.device_get(w.diagnostics)
    sps = timed / best
    base = BASELINE_STRESS.get(name)
    return {
        "steps_per_sec": round(sps, 1),
        "vs_cxx_same_n": round(sps / base, 2) if base else None,
        "warmup_wall_s": round(warm_s, 1),
        "max_penetration": float(d.max_penetration),
        "overflow": int(d.pair_overflow) + int(d.degree_overflow),
        "sanitized": int(d.sanitized),
    }


def _sync(world) -> float:
    # block_until_ready alone has proven unreliable through the axon tunnel;
    # a host transfer is a hard sync.
    return float(np.asarray(world.bodies.pos).sum())


def main() -> None:
    scene = load_scene("Stress1000")
    world, params, cap = scene.world, scene.params, scene.cap

    # Pre-compile every block length on a throwaway world so no timed block
    # pays XLA compile (each static n_steps is a distinct executable).
    for length in (100, 200, 300, BLOCK):
        _sync(run_steps(scene.world, params, cap, length))

    # ---- falling regime: steps 0-300 from scene build ----
    # Same window as the C++ 44.1 baseline (BASELINE.md: scene build ->
    # 300 steps in one wall-clock measurement, including the ~117
    # contact-free steps before the first landing).  Deterministic initial
    # state, so best-of-2 filters axon-tunnel stalls.
    falling_times = []
    for _ in range(2):
        t0 = time.perf_counter()
        w0 = run_steps(scene.world, params, cap, 300)
        _sync(w0)
        falling_times.append(time.perf_counter() - t0)
    falling_sps = 300 / min(falling_times)

    # Legacy sub-window (steps 100-300: landing cascade only, no ballistic
    # phase) kept for cross-round comparability.
    world = run_steps(world, params, cap, 100)   # steps 0-100
    _sync(world)
    t0 = time.perf_counter()
    world = run_steps(world, params, cap, 200)   # steps 100-300
    _sync(world)
    cascade_sps = 200 / (time.perf_counter() - t0)

    # ---- settle the pile (steps 300-700) ----
    for _ in range(2):
        world = run_steps(world, params, cap, 200)
    _sync(world)

    # ---- settled regime: timed blocks ----
    times = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        world = run_steps(world, params, cap, BLOCK)
        _sync(world)
        times.append(time.perf_counter() - t0)
    best_sps = BLOCK / min(times)
    median_sps = BLOCK / float(np.median(times))

    d = jax.device_get(world.diagnostics)
    result = {
        "metric": "stress1000_settled_steps_per_sec",
        "value": round(best_sps, 1),
        "unit": "steps/sec",
        "vs_baseline": round(best_sps / BASELINE_SETTLED, 2),
        "extra": {
            "device": str(jax.devices()[0]),
            "settled_median_steps_per_sec": round(median_sps, 1),
            "settled_median_vs_baseline": round(median_sps / BASELINE_SETTLED, 2),
            "falling_steps_per_sec": round(falling_sps, 1),
            "falling_vs_baseline": round(falling_sps / BASELINE_FALLING, 2),
            "cascade_steps_per_sec": round(cascade_sps, 1),
            "block_steps": BLOCK,
            "trials": TRIALS,
            "max_penetration": float(d.max_penetration),
            "active_manifolds": int(d.active_manifolds),
            "active_contacts": int(d.active_contacts),
            "overflow": int(d.pair_overflow) + int(d.degree_overflow),
        },
    }

    # Capacity-scaling tiers (fused kernel at 2048 bodies, gridded Pallas
    # at 4096).  Guarded: the headline metric above is already recorded.
    for name, warm, timed in (("Stress2048", 700, 200), ("Stress4096", 800, 200)):
        try:
            result["extra"][name.lower()] = _bench_capacity(name, warm, timed)
        except Exception as e:  # noqa: BLE001 — report, don't lose the headline
            result["extra"][name.lower()] = {"error": str(e)[:200]}

    print(json.dumps(result))


if __name__ == "__main__":
    main()
