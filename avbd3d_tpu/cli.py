"""Headless CLI: byte-compatible with the reference's --nogfx mode.

Mirrors main.cpp:189-248: flag parsing (--nogfx/--headless, --scene/-s,
--steps/-n), per-step dump of every body's position/orientation/velocities
(newest body first — the reference body list is LIFO), and the diagnostics
line.  This output format is the de-facto golden-trace test harness of the
reference.

Extra flags beyond the reference:
  --quiet        only the diagnostics line per step (fast host path)
  --bench        no per-step host sync; prints steps/sec at the end
  --print-every  print every K steps instead of every step
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import numpy as np

from .models.scenes import SCENE_NAMES, load_scene
from .solver import step
from .utils.cache import enable_compilation_cache


def _dump_step(step_idx: int, world, n_real: int, out) -> None:
    pos = np.asarray(world.bodies.pos_n3[:n_real])
    quat = np.asarray(world.bodies.quat_n4[:n_real])
    linvel = np.asarray(world.bodies.linvel_n3[:n_real])
    angvel = np.asarray(world.bodies.angvel_n3[:n_real])

    # Hot trace path: the native C formatter (utils/native.py) emits the
    # whole per-step dump in one call; fall back to Python formatting.
    from .utils.native import format_step_native

    text = format_step_native(step_idx, pos, quat, linvel, angvel, n_real)
    if text is not None:
        out.write(text)
        return
    out.write(f"Step {step_idx}:\n")
    # Reference body list is LIFO: newest body (highest id) prints first.
    for i in range(n_real - 1, -1, -1):
        out.write(
            "  Body %d: Pos(%.4f, %.4f, %.4f)  Rot(%.4f, %.4f, %.4f, %.4f)  "
            "LinVel(%.4f, %.4f, %.4f)  AngVel(%.4f, %.4f, %.4f)\n"
            % (
                i + 1,
                pos[i, 0], pos[i, 1], pos[i, 2],
                quat[i, 0], quat[i, 1], quat[i, 2], quat[i, 3],
                linvel[i, 0], linvel[i, 1], linvel[i, 2],
                angvel[i, 0], angvel[i, 1], angvel[i, 2],
            )
        )


def _physics_line(step_index: int, d, out) -> None:
    """The in-solver diagnostics line (solver.cpp:503-513): printed every
    ``logFrequency`` steps when diagnostics are enabled; headless mode
    forces enableDiagnostics=true, logFrequency=1 (main.cpp:207-208).
    ``step_index`` is the solver's 1-based step counter (solver.cpp:257)."""
    out.write(
        "[Physics] step %d | manifolds: %d | contacts: %d | dyn bodies: %d "
        "| maxPen: %.6f | maxDrift: %.6f | maxLin: %.3f | maxAng: %.3f "
        "| maxLambda: %.3f\n"
        % (
            step_index,
            int(d.active_manifolds),
            int(d.active_contacts),
            int(d.dynamic_bodies),
            float(d.max_penetration),
            float(d.max_constraint_violation),
            float(d.max_linear_speed),
            float(d.max_angular_speed),
            float(d.max_normal_impulse),
        )
    )


def _dump_diag(world, out) -> None:
    d = jax.device_get(world.diagnostics)
    out.write(
        "  Diagnostics: manifolds=%d contacts=%d dynBodies=%d maxPen=%.6f "
        "maxDrift=%.6f maxLin=%.3f maxAng=%.3f maxLambda=%.3f\n"
        % (
            int(d.active_manifolds),
            int(d.active_contacts),
            int(d.dynamic_bodies),
            float(d.max_penetration),
            float(d.max_constraint_violation),
            float(d.max_linear_speed),
            float(d.max_angular_speed),
            float(d.max_normal_impulse),
        )
    )
    overflow = int(d.pair_overflow) + int(d.degree_overflow)
    if overflow:
        out.write(f"  WARNING: capacity overflow ({overflow} dropped slots)\n")
    if int(d.sanitized):
        out.write(f"  WARNING: sanitized {int(d.sanitized)} non-finite states\n")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="AVBD 3D (TPU) headless runner")
    parser.add_argument("--nogfx", "--headless", action="store_true", dest="headless")
    parser.add_argument("--scene", "-s", default="TwoBlockDrop", choices=SCENE_NAMES)
    parser.add_argument("--steps", "-n", type=int, default=300)
    parser.add_argument("--quiet", action="store_true", help="diagnostics only")
    parser.add_argument("--bench", action="store_true", help="time steps/sec")
    parser.add_argument("--print-every", type=int, default=1)
    parser.add_argument(
        "--log-frequency", type=int, default=1,
        help="[Physics] line cadence (solver.logFrequency; headless forces "
        "diagnostics on with frequency 1, main.cpp:207-208); 0 disables",
    )
    args = parser.parse_args(argv)

    enable_compilation_cache()
    scene = load_scene(args.scene)
    world, params, cap = scene.world, scene.params, scene.cap
    out = sys.stdout

    out.write(f"Running in headless mode: scene '{scene.name}', steps={args.steps}\n")

    if args.bench:
        # Warm up the compile, then run without per-step host syncs.
        world = step(world, params, cap)
        jax.block_until_ready(world)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            world = step(world, params, cap)
        jax.block_until_ready(world)
        dt = time.perf_counter() - t0
        _dump_diag(world, out)
        out.write(
            f"{args.steps} steps in {dt:.3f}s = {args.steps / dt:.1f} steps/sec\n"
        )
        return 0

    for i in range(args.steps):
        world = step(world, params, cap)
        # Solver-side [Physics] line first (printed from inside
        # Solver::step in the reference), then main's per-body dump.
        if args.log_frequency > 0 and (i + 1) % args.log_frequency == 0:
            _physics_line(i + 1, jax.device_get(world.diagnostics), out)
        if (i + 1) % args.print_every and i != args.steps - 1:
            continue
        if not args.quiet:
            _dump_step(i, world, scene.n_real, out)
        else:
            out.write(f"Step {i}:\n")
        _dump_diag(world, out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
