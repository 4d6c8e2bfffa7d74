"""Micro-costs of broadphase-refresh building blocks at the Stress1000 shape.

Times (inside lax.scan of REPS dependent reps so dispatch amortizes):
  mask only        the (N, N) gap mask + per-row count (no selection)
  full D=24        candidate_lists as shipped
  full D=40        candidate_lists at the sphere-extent capacity
  topk 1024 k=24/40  bare lax.top_k on an (N, N) int32
  topk 512 k=40    bare top_k at the blocked-sweep column width
  sort payload     lax.sort of 10 (N,) payloads (the sweep's sort cost)

Usage:  python tools/bp_cost_micro.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from avbd3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from avbd3d_tpu import load_scene, run_steps  # noqa: E402
from avbd3d_tpu.ops.broadphase import candidate_lists  # noqa: E402

REPS = 50


def timed(name, fn, *args, trials=4):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:22s} {best / REPS * 1e6:9.1f} us/rep")
    return best / REPS


def main():
    sc = load_scene("Stress1000")
    w, p, c = sc.world, sc.params, sc.cap
    w = run_steps(w, p, c, 200)
    np.asarray(w.bodies.pos)
    b = w.bodies
    half = tuple(b.size[k] * 0.5 for k in range(3))
    n = b.n

    @jax.jit
    def mask_only(pos):
        def body(carry, _):
            px = (pos[0] + carry * 1e-12).reshape(n)
            py = pos[1].reshape(n)
            pz = pos[2].reshape(n)
            from avbd3d_tpu.ops.broadphase import world_halves
            wh = world_halves(tuple(b.quat[k] for k in range(4)), half)
            whf = [wh[k].reshape(n) for k in range(3)]
            gap = jnp.maximum(
                jnp.maximum(
                    jnp.abs(px[:, None] - px[None, :]) - (whf[0][:, None] + whf[0][None, :]),
                    jnp.abs(py[:, None] - py[None, :]) - (whf[1][:, None] + whf[1][None, :]),
                ),
                jnp.abs(pz[:, None] - pz[None, :]) - (whf[2][:, None] + whf[2][None, :]),
            )
            m = gap <= 0.04
            return carry + jnp.sum(m.astype(jnp.int32)).astype(jnp.float32), None
        out, _ = lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return out

    timed("mask+count only", mask_only, b.pos)

    def full(degree):
        @jax.jit
        def run(pos):
            def body(carry, _):
                pos2 = (pos[0] + carry * 1e-12, pos[1], pos[2])
                nb, key, thr, cand, slack = candidate_lists(
                    jnp.stack(pos2), b.quat, half, b.radius, b.dynamic,
                    w.exclusions, degree, p.bp_margin,
                )
                return carry + cand.astype(jnp.float32), None
            out, _ = lax.scan(body, jnp.float32(0.0), None, length=REPS)
            return out
        return run

    timed("candidate_lists D=24", full(24), b.pos)
    timed("candidate_lists D=40", full(40), b.pos)

    key = jax.random.PRNGKey(0)
    m1024 = jax.random.randint(key, (n, n), 0, 2**30, dtype=jnp.int32)
    m512 = m1024[:, :512]

    def bare_topk(mat, k):
        @jax.jit
        def run(m):
            def body(carry, _):
                v, i = lax.top_k(m + carry, k)
                return carry + v[0, 0] % 2, None
            out, _ = lax.scan(body, jnp.int32(0), None, length=REPS)
            return out
        return run, mat

    for k in (24, 40):
        fn, mat = bare_topk(m1024, k)
        timed(f"top_k (1024,1024) k={k}", fn, mat)
    fn, mat = bare_topk(m512, 40)
    timed("top_k (1024,512) k=40", fn, mat)

    pay = [jax.random.normal(jax.random.PRNGKey(i), (n,)) for i in range(10)]

    @jax.jit
    def sortp(key0, *pays):
        def body(carry, _):
            outs = lax.sort((key0 + carry,) + pays, dimension=0, num_keys=1)
            return carry + outs[0][0], None
        out, _ = lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return out

    timed("sort 10 payloads", sortp, pay[0], *pay[1:])


if __name__ == "__main__":
    main()
