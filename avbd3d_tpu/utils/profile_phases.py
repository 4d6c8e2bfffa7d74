"""Phase-level profiling of the step function on real inputs.

Times the full step at several iteration counts to split fixed vs
per-iteration cost, plus the broadphase/narrowphase/init phases.
Usage:  python -m avbd3d_tpu.utils.profile_phases [scene] [warm_steps]
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

from .cache import enable_compilation_cache

enable_compilation_cache()

from .. import load_scene, run_steps  # noqa: E402
from ..ops import replicated as rep  # noqa: E402
from ..ops.broadphase import neighbor_lists  # noqa: E402
from ..solver import body_tables, step  # noqa: E402


def bench(name, fn, *args, reps=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1e3:8.3f} ms")
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
    print(f"scene={scene_name} warm={warm} N={b.n} D={c.max_degree}")

    for its in (1, 5, 20):
        pi = p.replace(iterations=its)
        bench(f"full step its={its}", jax.jit(lambda w_, pi=pi: step.__wrapped__(w_, pi, c)), w)

    half = tuple(b.size[k] * 0.5 for k in range(3))
    bench(
        "broadphase",
        jax.jit(lambda pos, q, h, r, dy, e: neighbor_lists(pos, q, h, r, dy, e, c.max_degree)),
        b.pos, b.quat, half, b.radius, b.dynamic, w.exclusions,
    )
    nb, _ = neighbor_lists(b.pos, b.quat, half, b.radius, b.dynamic,
                           w.exclusions, c.max_degree)
    tables = body_tables(b)
    bench(
        "collide_and_init",
        jax.jit(lambda old, nbi: rep.collide_and_init(old, nbi, tables, p, rep.xla_gather)[0]),
        w.contacts, nb,
    )


if __name__ == "__main__":
    main()
