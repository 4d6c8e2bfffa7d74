"""Does kernel B (solve loop only) fit in VMEM at the Stress4096 shape?

The monolithic fused step kernel at G=40/D=28/Dc=16 is a hard VMEM OOM
(250 MB vs 128 MB — tools/try_fused_large.py).  The SAT narrowphase's
(D=28, G, 128) temporaries are the dominant term; kernel B runs at the
cache width (Dc=16) only.  If kernel B alone fits at G=40, the 4096 tier
becomes: gridded kernel A (body-local, grids trivially) + ONE kernel-B
program for the whole solve — zero cross-block staleness, the fused
kernel's clean settled envelope (measured per-step maxPen 0.0 on
Stress2048), at fused-kernel per-iteration cost.

Usage: python tools/try_kernel_b_large.py
"""

import sys
import time

sys.path.insert(0, ".")

from avbd3d_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from avbd3d_tpu.models import scenes as sc

    world, params, cap, _n = sc._scene_stress_n(16, 16, 16, max_degree=28,
                                                cache_degree=16)
    print(f"n={world.bodies.n} G={world.bodies.g} Dc=16", flush=True)

    from avbd3d_tpu import solver_tpu

    t0 = time.perf_counter()
    bodies, lam, pen, stick, diag = solver_tpu.solve_loop_tpu(
        world.contacts, world.bodies, params
    )
    _ = float(np.asarray(bodies.pos).sum())
    print(f"kernel B COMPILED+ran in {time.perf_counter() - t0:.1f}s",
          flush=True)

    import functools
    from jax import lax

    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(b, reps: int):
        def body(bb, _):
            b2, *_rest = solver_tpu.solve_loop_tpu.__wrapped__(
                world.contacts, bb, params
            )
            return b2, None

        return lax.scan(body, b, None, length=reps)[0]

    b = loop(world.bodies, 50)
    _ = float(np.asarray(b.pos).sum())
    for trial in range(2):
        t0 = time.perf_counter()
        b = loop(world.bodies, 50)
        _ = float(np.asarray(b.pos).sum())
        dt = time.perf_counter() - t0
        print(f"trial {trial}: {50 / dt:.1f} kernel-B calls/s "
              f"({dt / 50 * 1e3:.2f} ms/call, 20 iters)", flush=True)


if __name__ == "__main__":
    main()
