"""Per-stage TPU profile of the gridded large-N backend (step_grid).

Times, inside lax.scan blocks of REPS dependent repetitions (so host
dispatch amortizes), each stage of a settled Stress4096 step:

  full step      run_steps scan (the production number)
  refresh pred   refresh_or_reuse predicate + cond (cache hit path)
  kernel A grid  collide_and_init_grid (1 gridded launch)
  solve launch   one _iterblock_grid_call (grid_residency iterations)
  solve step     all solve launches of one step (scan-folded)
  predict+fin    XLA phases 3/5/6

Usage:  python tools/grid_profile.py [scene] [warm_steps]
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
from avbd3d_tpu import solver_tpu  # noqa: E402
from avbd3d_tpu.ops.broadphase import refresh_or_reuse  # noqa: E402
from avbd3d_tpu.solver import predict  # noqa: E402

REPS = 20


def timed(name, fn, *args, trials=4):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    per = best / REPS
    print(f"{name:22s} {per * 1e6:9.1f} us/rep   ({best * 1e3:.2f} ms / {REPS})")
    return per


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "Stress4096"
    warm = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    sc = load_scene(scene_name)
    w, p, c = sc.world, sc.params, sc.cap
    for _ in range(warm // 200):
        w = run_steps(w, p, c, 200)
    np.asarray(w.bodies.pos)
    b = w.bodies
    g = b.g
    gb = solver_tpu._pick_gb(g)
    print(f"scene={scene_name} warm={warm} N={b.n} G={g} gb={gb} "
          f"D={c.max_degree} dc={c.cache_degree} iters={p.iterations} "
          f"res={c.grid_residency}")

    @jax.jit
    def full(world):
        return run_steps.__wrapped__(world, p, c, REPS)

    timed("full step", full, w)

    @jax.jit
    def refresh(world):
        def body(bp, _):
            bp2 = refresh_or_reuse(bp, b, world.exclusions, c.max_degree,
                                   p.bp_margin, window=c.bp_window)
            return bp2, None
        bp, _ = lax.scan(body, world.bp, None, length=REPS)
        return bp.cand

    timed("refresh pred (hit)", refresh, w)

    bp = w.bp

    @jax.jit
    def ka(contacts):
        def body(cts, _):
            new, kept, once, dropped = solver_tpu.collide_and_init_grid.__wrapped__(
                cts, bp.nb, bp.key, bp.thr, b, p
            )
            return new, kept[0, 0]
        cts, _ = lax.scan(body, contacts, None, length=REPS)
        return cts

    timed("kernel A grid", ka, w.contacts)

    contacts, _kept, _once, _drop = solver_tpu.collide_and_init_grid(
        w.contacts, bp.nb, bp.key, bp.thr, b, p
    )

    linvel, angvel, ipos, iquat, ps, qs, _san = predict(b, p)

    def to_cg(a):
        return jnp.moveaxis(a, 0, 1).reshape(a.shape[1], g, 128)

    ip, iq = to_cg(ipos), to_cg(iquat)
    ps_cg, qs_cg = to_cg(ps), to_cg(qs)
    specs = solver_tpu._grid_specs(p, p.iterations,
                                   max(1, p.lhs_rebuild_every),
                                   c.grid_residency)

    @jax.jit
    def one_launch(pos, quat, lam, pen, stickf):
        def body(cc, _):
            pos2, quat2, lam2, pen2, st2, _sep = solver_tpu._iterblock_grid_call(
                p, gb, specs[0], contacts, b, cc[0], cc[1], cc[2], cc[3],
                cc[4], ip, iq,
            )
            return (pos2, quat2, lam2, pen2, st2), None
        cc, _ = lax.scan(body, (pos, quat, lam, pen, stickf), None, length=REPS)
        return cc[0]

    st_f = contacts.stick.astype(jnp.float32)
    per_launch = timed("solve launch (res)", one_launch, ps_cg, qs_cg,
                       contacts.lam, contacts.penalty, st_f)
    print(f"{'':22s} -> {len(specs)} launches/step = "
          f"{per_launch * len(specs) * 1e6:9.1f} us/step solve")

    @jax.jit
    def pred_fin(world):
        def body(w2, _):
            lv, av, ipos2, iquat2, ps2, qs2, san = predict(w2.bodies, p)
            # cheap stand-in for finalize's elementwise work
            return w2.replace(bodies=w2.bodies.replace(
                pos=to_cg(ipos2), quat=to_cg(iquat2))), san
        w2, _ = lax.scan(body, world, None, length=REPS)
        return w2.bodies.pos

    timed("predict (xla)", pred_fin, w)


if __name__ == "__main__":
    main()
