"""Phase-level profiling of the step function on real inputs.

Times each pipeline stage separately (jitted, synced) against a
representative world state so optimization effort goes where the time is.
Usage:  python -m avbd3d_tpu.utils.profile_phases [scene] [warm_steps]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from .cache import enable_compilation_cache

enable_compilation_cache()

from .. import load_scene, run_steps  # noqa: E402
from ..ops.broadphase import build_incidence, decode_keys, sphere_pairs  # noqa: E402
from ..ops.contacts import (  # noqa: E402
    contact_dual_update,
    contact_geometry,
    contact_primal_force,
    contact_rows,
    match_and_init,
)
from ..ops.narrowphase import collide_pairs  # noqa: E402
from ..solver import step  # noqa: E402


def bench_fn(name, fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    # hard sync via host transfer of one leaf
    np.asarray(jax.tree_util.tree_leaves(out)[0])

    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:24s} {dt * 1e3:8.3f} ms")
    return dt


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "Stress1000"
    warm = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    scene = load_scene(scene_name)
    w, p, c = scene.world, scene.params, scene.cap
    for _ in range(warm // 100):
        w = run_steps(w, p, c, 100)
    np.asarray(w.bodies.pos)
    b = w.bodies
    n = b.pos.shape[0]
    print(f"scene={scene_name} warm={warm} N={n} P={c.max_pairs} D={c.max_degree}")

    total = bench_fn("full step", jax.jit(lambda w_: step.__wrapped__(w_, p, c)), w, reps=20)

    t_bp = bench_fn(
        "broadphase",
        jax.jit(lambda pos, r, e: sphere_pairs(pos, r, e, c.max_pairs)),
        b.pos, b.radius, w.exclusion_keys,
    )

    keys, _ = sphere_pairs(b.pos, b.radius, w.exclusion_keys, c.max_pairs)
    ia, ib, pv = decode_keys(keys, n)
    t_np = bench_fn(
        "narrowphase",
        jax.jit(lambda pos, q, s: collide_pairs(pos, q, s, ia, ib, pv, margin=p.collision_margin)),
        b.pos, b.quat, b.size,
    )

    geom_out = collide_pairs(b.pos, b.quat, b.size, ia, ib, pv, margin=p.collision_margin)
    t_mi = bench_fn(
        "match_and_init",
        jax.jit(lambda old, k, g: match_and_init(old, k, g, b.pos, b.quat, p)),
        w.contacts, keys, geom_out,
    )

    t_inc = bench_fn(
        "build_incidence",
        jax.jit(lambda: build_incidence(ia, ib, geom_out["count"] > 0, b.dynamic, n, c.max_degree)),
    )

    contacts = match_and_init(w.contacts, keys, geom_out, b.pos, b.quat, p)
    t_geom = bench_fn(
        "contact_geometry x1",
        jax.jit(lambda pos, q: contact_geometry(contacts, pos, q, b.inv_mass, b.friction)),
        b.pos, b.quat,
    )

    geom = contact_geometry(contacts, b.pos, b.quat, b.inv_mass, b.friction)
    t_rows = bench_fn(
        "contact_rows x1",
        jax.jit(lambda g, l, pe, s: contact_rows(g, contacts, l, pe, s, p.alpha, p)),
        geom, contacts.lam, contacts.penalty, contacts.stick,
    )

    rows = contact_rows(geom, contacts, contacts.lam, contacts.penalty, contacts.stick, p.alpha, p)
    t_dual = bench_fn(
        "contact_dual x1",
        jax.jit(lambda r, g, pe: contact_dual_update(r, g, pe, p.beta, p)),
        rows, geom, contacts.penalty,
    )

    iters = p.iterations
    fixed = t_bp + t_np + t_mi + t_inc + t_geom
    per_iter = t_geom + t_rows + t_dual
    print(f"\nfixed per step (bp+np+match+inc+geom0): {fixed*1e3:.3f} ms")
    print(f"per-iteration rows+geom+dual (no assembly): {per_iter*1e3:.3f} ms x {iters} = {per_iter*iters*1e3:.3f} ms")
    print(f"full step: {total*1e3:.3f} ms -> assembly+solve per iter ~= "
          f"{(total - fixed - per_iter*iters)/iters*1e3:.3f} ms")


if __name__ == "__main__":
    main()
