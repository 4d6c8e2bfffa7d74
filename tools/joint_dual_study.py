"""Joint dual-ascent study: does lambda converge to the physical
constraint force on a hanging hard-weld chain?

Runs RodJointed (15 segments, top static, 14 hard welds) and compares the
y-row joint lambda on each link against the analytic chain tension
T_k = (14 - k) * m * g (the weight hanging below joint k).  This is the
validation harness for config.joint_ema_rate (ops/joints.joint_dual_ema);
the reference's own per-iteration ascent (solver.cpp:411-429) NaNs on this
scene (PARITY.md), so the bar is: stable for the full run AND lambda within
a few percent of T.

Usage: python tools/joint_dual_study.py [steps] [eta] [iterations]
"""

import sys

import jax
import numpy as np

sys.path.insert(0, ".")

from avbd3d_tpu import load_scene, run_steps  # noqa: E402


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    eta = float(sys.argv[2]) if len(sys.argv) > 2 else None
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else None

    scene = load_scene("RodJointed")
    w, p, c = scene.world, scene.params, scene.cap
    if eta is not None:
        p = p.replace(joint_ema_rate=eta)
    if iters is not None:
        p = p.replace(iterations=iters)
    print(f"eta={p.joint_ema_rate} iterations={p.iterations} steps={steps}")

    done = 0
    while done < steps:
        block = min(500, steps - done)
        w = run_steps(w, p, c, block)
        done += block
        d = jax.device_get(w.diagnostics)
        print(f"  step {done}: maxLin={float(d.max_linear_speed):.4f} "
              f"sanitized={int(d.sanitized)}")

    j = jax.device_get(w.joints)
    other = np.asarray(j.other)          # (DJ, G, 128)
    side = np.asarray(j.side)
    lam_y = np.asarray(j.lam[1])         # y linear row
    m, g = 0.25 * 1.0 * 0.25 * 1.0, 10.0  # segment mass (vol*density), |g|

    print(f"{'joint':>5} {'lam_y':>10} {'T_analytic':>10} {'ratio':>7}")
    worst = 0.0
    for k in range(14):  # joint k connects segment k (A) and k+1 (B)
        body = k + 1                      # read the B-side replica
        gi, li = body // 128, body % 128
        slot = np.where((other[:, gi, li] == k) & (side[:, gi, li] < 0))[0]
        lam = float(lam_y[slot[0], gi, li]) if slot.size else float("nan")
        t_k = (14 - k) * m * g
        ratio = lam / t_k
        worst = max(worst, abs(ratio - 1.0))
        print(f"{k:>5} {lam:>10.4f} {t_k:>10.4f} {ratio:>7.3f}")
    print(f"worst |ratio-1| = {worst:.3f}")


if __name__ == "__main__":
    main()
