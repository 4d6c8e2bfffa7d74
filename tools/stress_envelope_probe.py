"""Envelope probe for the capacity-scaling stress scenes.

Steps a stress scene through its full fall+land+settle window, recording the
PER-STEP diagnostics vector (not just block tails), plus realized broadphase
/ near-cache / manifold degree snapshots — the measurements that set
``max_degree`` / ``cache_degree`` / ``lhs_fresh_rebuild_every`` per scene
(see models/scenes.py Stress1000 notes; VERDICT r4 weakness #1 shipped
because the 4096 scene inherited 1000-validated numbers unmeasured).

Usage: python tools/stress_envelope_probe.py [Stress4096] [steps=1000]
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, ".")

from avbd3d_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from avbd3d_tpu import load_scene  # noqa: E402
from avbd3d_tpu.solver import step  # noqa: E402


@functools.partial(jax.jit, static_argnames=("params", "cap", "n_steps"))
def run_collect(world, params, cap, n_steps: int):
    """Advance n_steps, stacking the 16-lane diagnostics vector per step."""

    def body(w, _):
        w = step.__wrapped__(w, params, cap)
        return w, w.diagnostics.vec

    return lax.scan(body, world, None, length=n_steps)


def degree_snapshot(world):
    """Realized degrees from the current state (host-side reductions)."""
    nb_deg = jnp.max(jnp.sum((world.bp.nb >= 0).astype(jnp.int32), axis=0))
    near_deg = jnp.max(
        jnp.sum((world.contacts.other >= 0).astype(jnp.int32), axis=0)
    )
    man_deg = jnp.max(
        jnp.sum(
            ((world.contacts.other >= 0) & (world.contacts.count > 0)).astype(
                jnp.int32
            ),
            axis=0,
        )
    )
    return int(nb_deg), int(near_deg), int(man_deg)


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "Stress4096"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    block = 50
    # Tuning overrides: key=value pairs after the step count, e.g.
    #   python tools/stress_envelope_probe.py Stress4096 1000 cache_degree=16
    overrides = dict(kv.split("=") for kv in sys.argv[3:])
    from avbd3d_tpu.models.scenes import SCENES

    if {"cache_degree", "max_degree"} & overrides.keys() and name.startswith(
        "Stress"
    ) and name not in ("Stress1000",):
        from avbd3d_tpu.models import scenes as _sc

        dims = {"Stress2048": (13, 12, 13), "Stress4096": (16, 16, 16)}[name]
        world, params, cap, _n = _sc._scene_stress_n(
            *dims,
            max_degree=int(overrides.pop("max_degree", 24)),
            cache_degree=int(overrides.pop("cache_degree", 12)),
            order=overrides.pop("order", "yzx"),
        )
        from avbd3d_tpu.models.scenes import Scene

        sc = Scene(name=name, world=world, params=params, cap=cap, n_real=_n)
    else:
        sc = load_scene(name)
    w, params, cap = sc.world, sc.params, sc.cap
    def conv(cur, v):
        return v if isinstance(cur, str) else type(cur)(eval(v))

    for k, v in overrides.items():
        if hasattr(cap, k):
            cap = cap.replace(**{k: conv(getattr(cap, k), v)})
        else:
            params = params.replace(**{k: conv(getattr(params, k), v)})
    print(f"# {name}: n={w.bodies.n} D={cap.max_degree} "
          f"Dc={w.contacts.other.shape[0]} k_re={params.lhs_rebuild_every} "
          f"k_fr={params.lhs_fresh_rebuild_every} backend={cap.backend}",
          flush=True)

    worst = {"max_pen": 0.0, "pen_step": -1, "overflow": 0, "deg_over": 0,
             "sanitized": 0, "nb_deg": 0, "near_deg": 0, "man_deg": 0}
    t0 = time.perf_counter()
    for b0 in range(0, n_steps, block):
        w, vecs = run_collect(w, params, cap, block)
        vecs = np.asarray(vecs)
        pen = vecs[:, 0]
        i = int(np.argmax(pen))
        if pen[i] > worst["max_pen"]:
            worst["max_pen"] = float(pen[i])
            worst["pen_step"] = b0 + i
        worst["overflow"] += int(vecs[:, 9].sum())
        worst["deg_over"] += int(vecs[:, 10].sum())
        worst["sanitized"] += int(vecs[:, 8].sum())
        nb_d, near_d, man_d = degree_snapshot(w)
        worst["nb_deg"] = max(worst["nb_deg"], nb_d)
        worst["near_deg"] = max(worst["near_deg"], near_d)
        worst["man_deg"] = max(worst["man_deg"], man_d)
        print(
            f"steps {b0:4d}-{b0+block:4d}: maxPen {pen.max():.5f} "
            f"(blk max @ {b0+i}) overflow {int(vecs[:, 9].sum())} "
            f"degOver {int(vecs[:, 10].sum())} san {int(vecs[:, 8].sum())} "
            f"maxLin {vecs[:, 2].max():.2f} manifolds {int(vecs[-1, 6])} "
            f"deg nb/near/man {nb_d}/{near_d}/{man_d}",
            flush=True,
        )
    wall = time.perf_counter() - t0
    worst["steps_per_sec"] = round(n_steps / wall, 1)
    # Clean settled-throughput sample (bench-style: timed run_steps blocks,
    # best of 2, hard host sync).
    from avbd3d_tpu import run_steps

    _ = jax.device_get(run_steps(w, params, cap, 100).bodies.pos)  # compile
    best = None
    for _i in range(2):
        t0 = time.perf_counter()
        w2 = run_steps(w, params, cap, 100)
        _ = float(np.asarray(w2.bodies.pos).sum())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    worst["settled_steps_per_sec"] = round(100 / best, 1)
    print(json.dumps(worst))


if __name__ == "__main__":
    main()
