"""Can the fused step kernel compile above the round-2 Mosaic ceiling?

Round 2 recorded the Mosaic compile helper OOM-killed at G=33 groups (4224
bodies) and gated the fused path at n <= 2048 (solver.step).  That was
measured with the round-2 kernel (D=32 cache width, no control block, no
cache compaction).  This probe re-tests the ceiling with the CURRENT
kernel at the Stress4096 shape (G=40, D=28 candidates, Dc=16 cache) —
if it compiles and runs, the 4096 tier inherits the fused kernel's clean
settled envelope (per-step maxPen 0.0, measured on Stress2048) and its
per-iteration efficiency.

Usage: python tools/try_fused_large.py [scene] [steps]
"""

import sys
import time

sys.path.insert(0, ".")

from avbd3d_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "Stress4096"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from avbd3d_tpu.models import scenes as sc

    dims = {"Stress2048": (13, 12, 13), "Stress4096": (16, 16, 16)}[name]
    world, params, cap, _n = sc._scene_stress_n(*dims, max_degree=28,
                                                cache_degree=16)
    print(f"n={world.bodies.n} G={world.bodies.g} D=28 Dc=16", flush=True)

    from avbd3d_tpu import solver_tpu

    t0 = time.perf_counter()
    w = solver_tpu.step_pallas(world, params, cap)
    _ = float(np.asarray(w.bodies.pos).sum())
    print(f"COMPILED+ran 1 step in {time.perf_counter() - t0:.1f}s", flush=True)

    from avbd3d_tpu.solver import run_steps

    # Direct fused run (bypasses the n<=2048 dispatch gate) for timing.
    import functools
    import jax.numpy as jnp
    from jax import lax

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def run_fused(w, n_steps: int):
        def body(ww, _):
            return solver_tpu.step_pallas(ww, params, cap), None

        return lax.scan(body, w, None, length=n_steps)[0]

    t0 = time.perf_counter()
    w = run_fused(w, steps)
    _ = float(np.asarray(w.bodies.pos).sum())
    print(f"scan({steps}) compiled+ran in {time.perf_counter() - t0:.1f}s",
          flush=True)
    for trial in range(2):
        t0 = time.perf_counter()
        w = run_fused(w, steps)
        _ = float(np.asarray(w.bodies.pos).sum())
        dt = time.perf_counter() - t0
        print(f"trial {trial}: {steps / dt:.1f} steps/s", flush=True)
    d = jax.device_get(w.diagnostics)
    print(f"maxPen {float(d.max_penetration):.5f} overflow "
          f"{int(d.pair_overflow)}+{int(d.degree_overflow)} "
          f"san {int(d.sanitized)}")


if __name__ == "__main__":
    main()
