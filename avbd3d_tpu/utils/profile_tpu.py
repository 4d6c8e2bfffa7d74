"""Kernel-level TPU profiling of the Pallas backend.

Host dispatch on this stack costs ~2 ms per jitted call, so each phase is
timed INSIDE a lax.scan of REPS dependent repetitions (inputs perturbed by
the carry so XLA cannot hoist the body).  Prints a per-phase cost table:

  full step        run_steps scan (the production number)
  broadphase       (N,N) mask + top_k + symmetric-drop scatter
  kernel A         narrowphase + cross-step match (pallas)
  kernel B         20-iteration solve (pallas)
  kernel B 1-iter  fixed cost of kernel B (prediction/velocity/diag)

Usage:  python -m avbd3d_tpu.utils.profile_tpu [scene] [warm_steps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .cache import enable_compilation_cache

enable_compilation_cache()

from .. import load_scene, run_steps  # noqa: E402
from .. import solver_tpu  # noqa: E402
from ..ops.broadphase import candidate_lists, neighbor_lists  # noqa: E402

REPS = 50


def timed(name, fn, *args, trials=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    per = best / REPS
    print(f"{name:24s} {per * 1e6:9.1f} us/rep   ({best * 1e3:.2f} ms / {REPS})")
    return per


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "Stress1000"
    warm = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    scene = load_scene(scene_name)
    w, p, c = scene.world, scene.params, scene.cap
    for _ in range(warm // 100):
        w = run_steps(w, p, c, 100)
    np.asarray(w.bodies.pos)
    b = w.bodies
    print(f"scene={scene_name} warm={warm} N={b.n} D={c.max_degree} iters={p.iterations}")

    # ---- full step (the production path) ----
    @jax.jit
    def full(world):
        return run_steps.__wrapped__(world, p, c, REPS)

    timed("full step", full, w)

    # ---- broadphase (XLA stage only: mask + integer-key top_k) ----
    half = tuple(b.size[k] * 0.5 for k in range(3))

    @jax.jit
    def bp(pos, quat, radius, dynamic, excl):
        def body(carry, _):
            nb, key, thr, cand, _slack = candidate_lists(
                pos + carry * 1e-12, quat, half, radius, dynamic, excl,
                c.max_degree
            )
            return carry + cand.astype(jnp.float32), (nb, key, thr)
        carry, outs = lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return carry, jax.tree_util.tree_map(lambda x: x[-1], outs)

    timed("broadphase", bp, b.pos, b.quat, b.radius, b.dynamic, w.exclusions)

    nb, key, thr, _cand, _slack = candidate_lists(
        b.pos, b.quat, half, b.radius, b.dynamic, w.exclusions, c.max_degree
    )

    # ---- kernel A (symmetric filter + narrowphase + match) ----
    @jax.jit
    def ka(contacts, bodies):
        def body(cts, _):
            new, kept, _dropped = solver_tpu.collide_and_init_tpu.__wrapped__(
                cts, nb, key, thr, bodies, p
            )
            return new, kept
        cts, _ = lax.scan(body, contacts, None, length=REPS)
        return cts

    timed("kernel A", ka, w.contacts, b)

    contacts, _kept, _drop = solver_tpu.collide_and_init_tpu(w.contacts, nb, key, thr, b, p)

    # ---- kernel B at several iteration counts ----
    for its in (p.iterations, 5, 1):
        pi = p.replace(iterations=its)

        @jax.jit
        def kb(cts, bodies, pi=pi):
            def body(bd, _):
                bd2, lam, pen, stick, diag = solver_tpu.solve_loop_tpu.__wrapped__(cts, bd, pi)
                return bd2, diag[0, 0]
            bd, _ = lax.scan(body, bodies, None, length=REPS)
            return bd

        timed(f"kernel B its={its}", kb, contacts, b)


if __name__ == "__main__":
    main()
