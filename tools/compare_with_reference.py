#!/usr/bin/env python
"""Behavioral parity report: C++ reference oracle vs avbd3d_tpu.

Runs the same scenes through the freshly-built reference binary (see
tools/build_reference_oracle.sh) and this engine, and prints the
diagnostics envelopes side by side.  Parity is behavioral (settling,
penetration vs slop, contact-graph size), not bitwise — SURVEY.md section 7
explains why bitwise equality is unattainable (iteration order, f32
reassociation).

Two modes:

- envelope (default): end-state diagnostics side by side per scene.
- ``--trace``: additionally steps both engines in lockstep through the
  early trajectory (first ~50 steps) and reports the per-step position RMS
  between them — the engines track closely while dynamics are smooth, then
  diverge at contact-chaos onset (Gauss-Seidel vs Jacobi iteration order;
  bitwise equality is unattainable, SURVEY.md section 7).

``--report FILE`` writes the full comparison as a checked-in markdown
report.

Usage:  python tools/compare_with_reference.py [--trace] [--report FILE] [Scene ...]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avbd3d_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from avbd3d_tpu import load_scene, run_steps  # noqa: E402

ORACLE = os.environ.get("ORACLE_BIN", "/tmp/avbd_oracle/ref_headless")
STEPS = {"TwoBlockDrop": 300, "Stack": 300, "Pyramid": 300, "Wall": 300,
         "Stress1000": 600}


def run_oracle(scene: str, steps: int):
    out = subprocess.run(
        [ORACLE, "--scene", scene, "--steps", str(steps), "--log-every", str(steps)],
        capture_output=True, text=True, check=True,
    ).stdout
    m = re.search(
        r"ORACLE step \d+ mf (\d+) ct (\d+) maxPen ([\d.]+) maxLin ([\d.]+) "
        r"maxAng ([\d.]+) miny (-?[\d.]+) below (\d+)", out)
    keys = ("mf", "ct", "maxPen", "maxLin", "maxAng", "miny", "below")
    return dict(zip(keys, [float(x) for x in m.groups()]))


def run_ours(scene_name: str, steps: int):
    scene = load_scene(scene_name)
    w, p, c = scene.world, scene.params, scene.cap
    # Parity runs disable the fall-freeze quarantine (a documented deviation:
    # the reference lets ejected bodies free-fall forever, solver.cpp has no
    # floor) so the deviation cannot mask trajectory drift in these checks.
    p = p.replace(fall_freeze_y=-1.0e9)
    done = 0
    while done < steps:
        block = min(100, steps - done)
        w = run_steps(w, p, c, block)
        done += block
    float(np.asarray(w.bodies.pos).sum())
    d = jax.device_get(w.diagnostics)
    ys = np.asarray(w.bodies.pos_n3[1:scene.n_real, 1]) if scene.n_real > 1 else np.asarray([0.0])
    return {
        "mf": int(d.active_manifolds), "ct": int(d.active_contacts),
        "maxPen": float(d.max_penetration), "maxLin": float(d.max_linear_speed),
        "maxAng": float(d.max_angular_speed),
        "miny": float(ys.min()), "below": int((ys < -0.1).sum()),
    }


def run_trace(scene_name: str, trace_steps: int = 50):
    """Lockstep early-trajectory comparison.

    Returns dict with per-step position RMS (ours vs oracle, over the real
    bodies; our creation index i is the oracle's id i+1, rigid.cpp:10) and
    both engines' per-step maxPen.
    """
    from avbd3d_tpu.solver import step

    out = subprocess.run(
        [ORACLE, "--scene", scene_name, "--steps", str(trace_steps),
         "--dump-steps", str(trace_steps), "--log-every", str(trace_steps + 1)],
        capture_output=True, text=True, check=True,
    ).stdout
    ref_pos: dict = {}
    ref_pen: dict = {}
    for line in out.splitlines():
        t = line.split()
        if t and t[0] == "BODY":
            s, bid = int(t[1]), int(t[2])
            ref_pos.setdefault(s, {})[bid] = [float(x) for x in t[3:6]]
        elif t and t[0] == "TRACE":
            ref_pen[int(t[1])] = float(t[3])

    scene = load_scene(scene_name)
    w, p, c = scene.world, scene.params, scene.cap
    p = p.replace(fall_freeze_y=-1.0e9)  # see run_ours
    n = scene.n_real
    rms, our_pen = [], []
    for s in range(1, trace_steps + 1):
        w = step(w, p, c)
        ours = np.asarray(w.bodies.pos_n3)[:n]
        ref = np.asarray([ref_pos[s][i + 1] for i in range(n)])
        rms.append(float(np.sqrt(np.mean((ours - ref) ** 2))))
        our_pen.append(float(jax.device_get(w.diagnostics).max_penetration))
    return {
        "rms": rms,
        "our_pen": our_pen,
        "ref_pen": [ref_pen.get(s, 0.0) for s in range(1, trace_steps + 1)],
    }


def main():
    args = sys.argv[1:]
    do_trace = "--trace" in args
    report_path = None
    if "--report" in args:
        report_path = args[args.index("--report") + 1]
        args.remove("--report")
        args.remove(report_path)
    if do_trace:
        args.remove("--trace")
    scenes = args or list(STEPS)

    lines = []

    def emit(s=""):
        print(s)
        lines.append(s)

    emit("## Behavioral envelopes (end state)")
    emit()
    emit("| scene | engine | manifolds | contacts | maxPen | maxLin | maxAng | miny | below |")
    emit("|---|---|---|---|---|---|---|---|---|")
    for s in scenes:
        steps = STEPS.get(s, 300)
        ref = run_oracle(s, steps)
        ours = run_ours(s, steps)
        for tag, row in (("C++", ref), ("tpu", ours)):
            emit(f"| {s} ({steps}) | {tag} | {int(row['mf'])} | {int(row['ct'])} "
                 f"| {row['maxPen']:.4f} | {row['maxLin']:.2f} "
                 f"| {row['maxAng']:.2f} | {row['miny']:.2f} | {int(row['below'])} |")

    if do_trace:
        emit()
        emit("## Early-trajectory lockstep trace (position RMS, ours vs C++)")
        emit()
        emit("| scene | s=1 | s=5 | s=10 | s=20 | s=30 | s=50 | maxPen ours | maxPen C++ |")
        emit("|---|---|---|---|---|---|---|---|---|")
        for s in scenes:
            if s == "Stress1000":
                continue  # 40 s/step on the XLA/CPU path; envelope covers it
            tr = run_trace(s, 50)
            r = tr["rms"]
            emit(f"| {s} | {r[0]:.2e} | {r[4]:.2e} | {r[9]:.2e} | {r[19]:.2e} "
                 f"| {r[29]:.2e} | {r[49]:.2e} | {max(tr['our_pen']):.4f} "
                 f"| {max(tr['ref_pen']):.4f} |")

    if report_path:
        with open(report_path, "w") as f:
            f.write("# Parity report: avbd3d_tpu vs the C++ reference oracle\n\n")
            f.write("Generated by `tools/compare_with_reference.py --trace "
                    f"--report {report_path}`.\n\n")
            f.write("\n".join(lines) + "\n")
            f.write(DEVIATIONS)


DEVIATIONS = """
## Documented deviations (deliberate, measured)

- **Hard-joint duals use a once-per-step EMA tracker, not per-iteration
  ascent** (`config.joint_ema_rate=0.05` ON by default;
  `joint_dual_rate=0`), diverging from the reference's per-iteration dual
  ascent on hard rows (solver.cpp:411-429).  Measured rationale
  (PERF_NOTES.md, tools/joint_dual_study.py): on a hard-weld chain the
  Jacobi primal never converges C within a step, so per-iteration ascent
  integrates unconverged residual and pumps energy at ANY rate tested
  (0.05-1.5x) — and the REFERENCE ITSELF diverges to NaN on its own rod
  scene (reproduced via the `ref_rod` oracle; its joints ship commented
  out as "WIP").  The EMA tracker updates lambda once per step at the
  final poses (`lambda += eta*penalty*C`); at quasi-static balance its
  fixed point is EXACTLY the constraint force, and per-step growth is
  bounded by eta times the physical row force, so divergence is
  structurally impossible.  Validated: on RodJointed at iterations=20 the
  per-link lambda matches the analytic chain tension within 0.6%
  (regression-gated in tests/test_joint_dual_tension.py); anchor drift
  ~8e-4 under dynamic load (vs inf for the reference).  Per-iteration
  ascent stays available as the `joint_dual_rate` knob for isolated
  (non-chained) joints, where it is stable and converges lambda to the
  exact constraint force — chains must keep it 0 (a convergence gate was
  tried and measured divergent: a chain's Jacobi contraction is
  ~(1-1/L^2)/iteration, so unconverged residual looks stationary).
- **Spring geometric-stiffness Hessian `H_ll` is not computed.**  The
  reference computes it every call and never consumes it (spring.cpp:46-55,
  87-89); see ops/springs.py:11-14.
- **Contact-row `motor` is not carried.**  The reference adds
  `rows[i].motor` into the primal force for every row incl. manifold rows
  (solver.cpp:380) but nothing in the codebase ever sets it nonzero for
  contacts; this engine carries motor only for joint rows
  (ops/joints.py `rmotor`).  `fracture` (solver.h:97) is likewise
  allocated-but-never-read upstream and is not carried at all.
- **Jacobi primal with relaxation 0.85** vs the reference's Gauss-Seidel
  body sweep (solver.cpp:344-409): trajectories diverge at contact-chaos
  onset; parity is behavioral (envelopes above), per SURVEY.md section 7.
- **Impact iteration boost** (`config.impact_iterations=20`): the round-2
  lockstep trace showed the Jacobi primal at Stack's 10 iterations
  transiently penetrating 0.0095 > slop during the landing (the C++
  Gauss-Seidel stays at 0.0000) — a parallel Jacobi sweep propagates
  corrections ~half as fast as a sequential GS sweep through a contact
  chain.  Fix shipped in round 3: steps where any dynamic body moves
  faster than `impact_speed_min=0.5` run `max(iterations, 20)` sweeps
  (the reference's own mass-contact tuning, scenes.h:91-94, applied
  automatically).  Measured Stack worst transient: 0.0095 -> 0.0004 on
  CPU, 0.0002 on TPU hardware; regression-tested stepwise in
  tests/test_scenes_integration.py.  Scenes already at 20 iterations
  (Stress1000) are bit-identical — the boost compiles out.
"""


if __name__ == "__main__":
    main()
