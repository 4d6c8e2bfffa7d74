"""Solver configuration (the three config tiers of the reference).

The reference splits configuration across compile-time constants
(``solver.h:25-36``), runtime solver params (``solver.cpp:240-253``), and
module-local tuning constants (``manifold.cpp:17-23``, ``collision.cpp:18-23``).
Here they all live in one frozen dataclass that is treated as a *static*
argument to ``jit`` — changing any field re-traces, which is the TPU analog of
recompiling the C++.

``Capacity`` holds the static-shape capacity plan (max candidate pairs, max
contact degree per body) that replaces the reference's dynamic allocation of
``Manifold`` objects (solver.cpp:261-270).
"""

from __future__ import annotations

import dataclasses

from jax.tree_util import register_static

FLT_MAX = 3.4028235e38


@register_static
@dataclasses.dataclass(frozen=True)
class SolverParams:
    # --- runtime params (solver.cpp:240-253) ---
    dt: float = 1.0 / 60.0
    gravity: tuple = (0.0, -10.0, 0.0)
    iterations: int = 10
    alpha: float = 0.95
    beta: float = 1.0e5
    gamma: float = 0.99
    post_stabilize: bool = False

    # --- compile-time constants (solver.h:25-36) ---
    penalty_min: float = 2.0e4
    penalty_max: float = 1.0e9
    collision_margin: float = 0.02
    stick_thresh: float = 0.02
    penetration_slop: float = 0.005

    # --- manifold tuning constants (manifold.cpp:17-23, solver.cpp:29) ---
    normal_contact_margin: float = 0.01
    stick_anchor_max_drift: float = 0.015
    stick_normal_min_dot: float = 0.995
    warmstart_max_drift: float = 0.08
    warmstart_normal_min_dot: float = 0.9
    normal_force_cap: float = 5000.0
    manifold_penalty_cap: float = 2.0e6

    # --- dual-ramp blending (solver.cpp:94-125) ---
    angular_beta_scale: float = 0.01

    # --- integration damping / clamps (solver.cpp:85-92, 433-454) ---
    linear_damping: float = 0.995
    angular_damping: float = 0.97
    max_angular_speed: float = 80.0

    # --- TPU-rebuild-specific knobs (no reference equivalent) ---
    # Under-relaxation for the Jacobi (all-bodies-at-once) primal update.
    # The C++ primal pass is Gauss-Seidel (solver.cpp:344-409); a parallel
    # Jacobi update overshoots when two touching dynamic bodies both correct
    # the full pair error, which can catapult bodies during impact cascades
    # (a falling stack landing).  0.85 removes the blow-ups in seeded
    # stack-drop trials (4/4 stable vs 1/4 at 1.0) at a negligible
    # convergence cost.
    relaxation: float = 0.85
    # Penalty cap for hard joint rows — PENALTY_MAX = 1e9, matching the
    # reference (solver.cpp:425, solver.h:26-27).  In practice the cap
    # never binds: the per-iteration ramp gain*|C| against the per-step
    # gamma decay equilibrates far below it.
    joint_penalty_cap: float = 1.0e9
    # Newton-matrix refresh cadence: the 6x6 LHS (penalty JJ^T outer
    # products + gyro regularizer, solver.cpp:384-397) is rebuilt every
    # k-th solver iteration and reused in between (modified Newton).  The
    # gradient (RHS) is always fresh, so the converged fixed point is
    # unchanged — staleness only alters the convergence path.  1 =
    # reference-exact per-iteration rebuild.
    #
    # Staleness is SPEED-GATED: during energetic impacts the penalty ramp
    # outruns a stale Hessian and the under-estimated curvature can
    # catapult bodies (measured: one Stress1000 landing at fixed k=5
    # ejects a cube at terminal velocity; k=1 never does).  Steps whose
    # max dynamic-body speed exceeds ``lhs_stale_speed_max`` therefore
    # rebuild every iteration; the stale cadence applies only in the
    # low-energy regime where it is measurably safe (2000-step settled
    # runs at k in {4, 10}: maxPen 0, no ejections, rest noise equal to
    # k=1).
    lhs_rebuild_every: int = 4
    lhs_stale_speed_max: float = 1.0
    # Hessian-rebuild cadence used on ENERGETIC (gate-fresh) steps.  1 =
    # reference-exact per-iteration rebuild (the measured-safe default —
    # see the catapult note above).  >1 trades impact-phase Hessian
    # freshness for falling-regime throughput; validate penetration/eject
    # envelopes before shipping a non-1 value anywhere.
    lhs_fresh_rebuild_every: int = 1
    # Broadphase candidate margin: sphere radii are enlarged by this much
    # during candidate selection, and the lists are reused until any body
    # has moved more than bp_margin/2 from the refresh anchor — an exact
    # superset of truly-overlapping pairs at all times (see
    # ops/broadphase.BroadphaseCache).  In a settled pile this amortizes
    # the O(N^2)+top_k stage to ~nothing; 0 disables reuse.
    bp_margin: float = 0.04
    # Bodies ejected off the ground slab free-fall forever (the C++ does
    # this too: its own Stress1000 landing throws 15 cubes off the slab,
    # which then accelerate to terminal velocity for the rest of the run —
    # measured via the reference oracle).  A body below this height is
    # frozen in place with zeroed velocities: it can never interact again,
    # and letting it fall forever would otherwise pin the max-speed /
    # max-displacement gates above and disable every slow-regime
    # optimization.  Set very negative to disable.
    fall_freeze_y: float = -100.0
    # Ballistic fast path: when the previous step had zero contacts and
    # the broadphase probe proves narrowphase yields none at the current
    # poses (every candidate sphere gap > collision_margin, no capacity
    # drop), the step result is exactly the inertial target and the
    # iterative solve is skipped (solver._ballistic_step).  Exact — the
    # primal with zero rows converges to the inertial pose — and gated on
    # prev-contacts==0 so the settled hot path never pays the probe.
    ballistic: bool = True
    # Rate on the hard-joint dual ascent (lambda += rate*penalty*C each
    # iteration; the reference uses rate 1).  Default 0 = penalty-only.
    # Measured behavior on a 14-link hard-weld chain (RodJointed): the
    # REFERENCE ITSELF DIVERGES to NaN (its joints ship commented-out as
    # "WIP"), and any rate > 0 diverges here too — on a swinging chain the
    # primal never converges C within a step, so the ascent integrates
    # unconverged residual and pumps energy.  Penalty-only is
    # unconditionally stable with anchor drift ~8e-4 under dynamic load
    # (vs inf for the reference).  Isolated joints (no chain) are stable
    # under ascent and converge lambda to the exact constraint force, so
    # the knob stays available.  (An iteration-stationarity gate was also
    # tried and diverges: a chain's Jacobi contraction is ~(1 - 1/L^2) per
    # iteration, so an unconverged residual looks stationary — measured
    # lambda 4e12 on RodJointed.  See ops/joints.joint_dual.)
    joint_dual_rate: float = 0.0
    # Slow once-per-step dual tracker on hard joint rows
    # (ops/joints.joint_dual_ema): lambda += eta*penalty*C at the final
    # poses, with the phase-2 lambda decay skipped for these rows.  At
    # quasi-static force balance this is lambda += eta*(T - lambda) — an
    # exponential tracker whose fixed point is EXACTLY the constraint
    # force, with time constant 1/eta steps; the small rate averages out
    # the penalty-ramp limit-cycle breathing that keeps chains from ever
    # strictly resting, and makes divergence structurally impossible
    # (per-step growth bounded by eta times the physical row force).
    # Validated on RodJointed (tools/joint_dual_study.py): 2000 steps
    # stable; at iterations=20 the chain rests and per-link lambda matches
    # the analytic chain tension within 0.6% (at the default 10 sweeps a
    # 15-link chain never converges per step and lambda tracks the inflated
    # dynamic holding force — bounded, but ~6.5x the static tension).
    # 0 disables (pure penalty equilibrium).
    joint_ema_rate: float = 0.05
    # Impact iteration boost: energetic near-contact steps run
    # max(iterations, impact_iterations) primal/dual sweeps instead of
    # ``iterations``.  The Jacobi primal converges ~2x slower than the
    # reference's Gauss-Seidel sweep during impact transients (a 10-cube
    # stack landing at 10 Jacobi sweeps transiently penetrates 0.0095 >
    # slop 0.005 while the C++ stays at 0.0000; 20 sweeps land at 0.0017
    # — measured, see PARITY.md).  The reference itself raises iterations
    # to 20 under mass contact (scenes.h:91-94); this knob automates
    # that, gated on any dynamic body moving faster than
    # ``impact_speed_min`` (global test, deliberately NOT the
    # stale-gate's near-contact refinement: a coherently landing pile
    # falls together, so per-slot relative reach stays calm through the
    # compression steps that need the extra sweeps — measured on Stack,
    # refined gate 0.0093 vs global gate 0.0004).  Settled steps pay
    # nothing.  Scenes already at >= impact_iterations
    # (Stress1000 at 20) are bit-identical: the boost is compiled out.
    # 0 disables.
    impact_iterations: int = 20
    impact_speed_min: float = 0.5

    def replace(self, **kw) -> "SolverParams":
        return dataclasses.replace(self, **kw)


@register_static
@dataclasses.dataclass(frozen=True)
class Capacity:
    """Static-shape capacity plan for one scene.

    The reference allocates manifolds dynamically; a jit-compiled TPU step
    needs fixed buffer sizes.  ``max_degree`` is the number of neighbor
    slots per body in the replicated contact cache (D).  Overflows are
    counted in diagnostics — never silent.
    """

    max_degree: int = 16       # max broadphase candidates per body (D slots)
    # Contact-cache width (near-contact slots per body).  0 = max_degree
    # (no culling).  When smaller, kernel A pre-culls the candidate slots
    # to this width by the cheap 6-face-axis separation test BEFORE the
    # 15-axis SAT (ops/replicated.precull_near): the broadphase must
    # provision for the worst-case PROXIMITY degree, but the narrowphase,
    # the warmstart match, the solve loop, and the cross-kernel cache
    # traffic all scale with the realized NEAR degree, which is much
    # smaller (Stress1000: 20 candidates vs 10 near slots vs 9 manifolds
    # max).  Overflow is counted in diagnostics.degree_overflow, never
    # silent.
    cache_degree: int = 0
    joint_degree: int = 0      # max joints incident to one body
    spring_degree: int = 0     # max springs incident to one body
    # Number of colors in the joint-graph coloring (1 = no joints; the
    # primal pass runs one Gauss-Seidel sub-pass per color).
    joint_colors: int = 1
    # Broadphase refresh algorithm: 0 = row-blocked O(N²) masked matrix;
    # > 0 = sorted-axis sweep with this window (candidate_lists_swept) —
    # sub-quadratic, exactness-guarded (falls back to the matrix inside a
    # lax.cond whenever the window could miss a pair), identical outputs.
    # The window must cover the worst-case count of bodies overlapping in
    # sorted order along the sweep axis; the stress scenes measure ~0.1*N.
    # Single-shard only (sharded worlds keep the matrix path).
    bp_window: int = 0
    # 'auto': fused Pallas kernel on TPU up to 2048 bodies, gridded Pallas
    # (contact-only) up to 16384, portable XLA otherwise.  'xla' /
    # 'pallas' / 'grid' force a backend.
    backend: str = "auto"
    # Grid tier: solver iterations resident per gridded launch.  Within a
    # launch each block's own poses stay exact (its table rows are rewritten
    # in VMEM every iteration) while OTHER blocks' partner poses hold their
    # launch-start values — so residency bounds the cross-block pose lag
    # (block-Jacobi).  1 = per-iteration launches (no lag, max launch
    # overhead).  4 matches the stress scenes' AL cadence and was validated
    # by the large-N envelope probe (tools/stress_envelope_probe.py).
    grid_residency: int = 4

    def replace(self, **kw) -> "Capacity":
        return dataclasses.replace(self, **kw)


def default_params() -> SolverParams:
    """defaultParams() of the reference (solver.cpp:240-253)."""
    return SolverParams()
