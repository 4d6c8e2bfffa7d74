"""Pallas TPU backend: the AVBD step as two mega-kernels.

On this TPU stack, XLA scalar gathers run at ~7ns/element and every kernel
launch costs tens of microseconds — a step graph with ~100 gathers and ~700
kernels is overhead-bound regardless of FLOPs.  This backend runs the same
replicated body-major core (ops/replicated.py) inside two Mosaic kernels:

  Kernel A  narrowphase + cross-step match + warmstart init (phase 2)
  Kernel B  prediction, the full iterative solve, velocity update and
            diagnostics (phases 3-6): everything executes inside one kernel
            with state resident in VMEM.  The only cross-body communication
            (neighbor pose fetch) uses the G-way broadcast-select gather
            (rep.select_gather), which lowers to lane-local take_along_axis
            — no XLA gather anywhere.

Because Bodies/Contacts state is stored component-major (state.py), every
kernel operand is a state leaf passed as-is: the XLA glue per step is just
the broadphase candidate stage and a handful of scalar extractions.
Joint/spring row families run inside the kernel in the same replicated
body-major layout (ops/joints.py, ops/springs.py), with Gauss-Seidel color
sub-passes for hard-joint graphs.  Restriction: N <= 1024 bodies (G <= 8);
bigger scenes fall back to the XLA backend (solver.step dispatch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import cm
from .config import Capacity, SolverParams
from .maths import solve66_cm
from .ops import replicated as rep
from .state import Contacts, Diagnostics, World

_CACHE_FIELDS = (
    "other", "count", "feature", "r_a", "r_b", "normal",
    "stick", "c0_n", "c0_t1", "c0_t2", "lam", "penalty",
)


def _interpret_mode() -> bool:
    """Run the kernels in Pallas interpret mode off-TPU.  Only used when a
    pallas_call actually executes on a non-TPU backend (rare: the CPU test
    path goes through the pure-math twins below, which compile ~40x faster
    than interpret mode while exercising identical math)."""
    return jax.default_backend() != "tpu"


def _cache_to_args(c: Contacts):
    out = []
    for f in _CACHE_FIELDS:
        v = getattr(c, f)
        out.append(v.astype(jnp.float32) if v.dtype == jnp.bool_ else v)
    return out


def _args_to_cache(args):
    kw = dict(zip(_CACHE_FIELDS, args))
    kw["stick"] = kw["stick"] > 0.5
    return Contacts(**kw)


def _read_cache(refs):
    args = [r[:] for r in refs]
    return _args_to_cache(args)


def _q_normalize(q):
    msq = q[0] ** 2 + q[1] ** 2 + q[2] ** 2 + q[3] ** 2
    bad = msq < 1e-6
    inv = jnp.where(bad, 0.0, 1.0 / jnp.sqrt(jnp.where(bad, 1.0, msq)))
    return tuple(
        jnp.where(bad, jnp.float32(k == 3), q[k] * inv) for k in range(4)
    )


def _san3(comps, fallback, count):
    """Component-form sanitizeVec3 (solver.cpp:51-58) with a reset counter."""
    finite = (
        jnp.isfinite(comps[0]) & jnp.isfinite(comps[1]) & jnp.isfinite(comps[2])
    )
    out = tuple(jnp.where(finite, c, f) for c, f in zip(comps, fallback))
    return out, count + jnp.sum((~finite).astype(jnp.float32))


def _san4(comps, fallback, count):
    finite = (
        jnp.isfinite(comps[0]) & jnp.isfinite(comps[1])
        & jnp.isfinite(comps[2]) & jnp.isfinite(comps[3])
    )
    out = tuple(jnp.where(finite, c, f) for c, f in zip(comps, fallback))
    return out, count + jnp.sum((~finite).astype(jnp.float32))


def _world_inertia_comps(quat, diag):
    """(G,128)-component world inertia: I_w[i][j] = sum_k d_k ax_k[i] ax_k[j]
    (rigid.cpp:51-59)."""
    axes = cm.q_axes(quat)
    comps = []
    for i, j in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)):
        comps.append(sum(diag[k] * axes[k][i] * axes[k][j] for k in range(3)))
    return comps


# ---------------------------------------------------------------------------
# Kernel A: narrowphase + match + init (phase 2)
# ---------------------------------------------------------------------------

def _make_kernel_a(params: SolverParams):
    from .ops.broadphase import symmetric_filter

    def kernel(*refs):
        old = _read_cache(refs[:12])
        nb_raw = refs[12][:]
        keys = refs[13][:]
        thr = refs[14][:]
        pos_r, quat_r, size_r, invm_r, fric_r = refs[15:20]
        body = {
            "pos": tuple(pos_r[k] for k in range(3)),
            "quat": tuple(quat_r[k] for k in range(4)),
            "half": tuple(size_r[k] * 0.5 for k in range(3)),
            "inv_mass": invm_r[:],
            "friction": fric_r[:],
        }
        out_refs = refs[20:]
        # Symmetric broadphase filter runs here (gathers are free in-kernel,
        # ~7 ns/element in XLA — see ops/broadphase.py).
        dynamic = body["inv_mass"] > 0.0
        neighbors, kept = symmetric_filter(nb_raw, keys, thr, dynamic, rep.select_gather)
        new, dropped = rep.collide_and_init(
            old, neighbors, body, params, rep.select_gather
        )
        for ref, val in zip(out_refs[:-1], _cache_to_args(new)):
            ref[:] = val
        lane = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        row = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        out_refs[-1][:] = (
            jnp.where((row == 0) & (lane == 0), kept.astype(jnp.float32), 0.0)
            + jnp.where((row == 0) & (lane == 1), dropped.astype(jnp.float32), 0.0)
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("params",))
def collide_and_init_tpu(old: Contacts, nb_raw, keys, thr, b, params: SolverParams):
    """Kernel A: symmetric broadphase filter + narrowphase + warmstart init.
    Returns (contacts, kept directed-slot count, dropped-manifold count)."""
    in_args = _cache_to_args(old) + [nb_raw, keys, thr, b.pos, b.quat, b.size,
                                     b.inv_mass, b.friction]
    out_shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in _cache_to_args(old)]
    out_shapes.append(jax.ShapeDtypeStruct((8, 128), jnp.float32))
    outs = pl.pallas_call(
        _make_kernel_a(params),
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(in_args),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shapes),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret_mode(),
    )(*in_args)
    return (_args_to_cache(outs[:-1]), outs[-1][0, 0].astype(jnp.int32),
            outs[-1][0, 1].astype(jnp.int32))


# ---------------------------------------------------------------------------
# Broadphase probe kernel: min candidate sphere gap + near-contact mask.
# Powers the ballistic fast path and the near-refined stale-LHS gate
# (ops/broadphase.bp_probe for the semantics).  Unblocked (G <= 16 scenes).
# ---------------------------------------------------------------------------

def _make_kernel_probe(params: SolverParams):
    from .ops.broadphase import bp_probe

    g_len = float(sum(x * x for x in params.gravity) ** 0.5)

    def kernel(nb_ref, pos_ref, quat_ref, size_ref, rad_ref, lv_ref, av_ref,
               out_s_ref, out_near_ref):
        min_gap, n_slots, near = bp_probe(
            nb_ref[:],
            tuple(pos_ref[k] for k in range(3)),
            tuple(quat_ref[k] for k in range(4)),
            tuple(size_ref[k] * 0.5 for k in range(3)),
            rad_ref[:],
            tuple(lv_ref[k] for k in range(3)),
            tuple(av_ref[k] for k in range(3)),
            params.dt, params.collision_margin, g_len, rep.select_gather,
        )
        lane = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        row = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        first = row == 0
        out_s_ref[:] = (
            jnp.where(first & (lane == 0), min_gap, 0.0)
            + jnp.where(first & (lane == 1), n_slots.astype(jnp.float32), 0.0)
        )
        out_near_ref[:] = near.astype(jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("params",))
def bp_probe_tpu(nb, b, params: SolverParams):
    """Returns (min_gap f32, n_slots i32, near (G,128) bool)."""
    g = nb.shape[1]
    outs = pl.pallas_call(
        _make_kernel_probe(params),
        out_shape=[
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((g, 128), jnp.float32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        # (D, G, 128) SAT temporaries exceed the 16M default scoped-vmem
        # limit at G=16, D=24 (Stress2048: 27.9M measured) — same raised
        # ceiling as the step kernel.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret_mode(),
    )(nb, b.pos, b.quat, b.size, b.radius, b.linvel, b.angvel)
    s, near = outs
    return s[0, 0], s[0, 1].astype(jnp.int32), near > 0.5


# ---------------------------------------------------------------------------
# Control-block kernel: the 5 step-control scalars (state.Diagnostics lanes
# 11-15) on the current state — used by the ballistic fast path to refill
# the block after skipping the solve (the fused step kernel computes the
# same lanes in-kernel; ops/broadphase.control_lanes for semantics).
# ---------------------------------------------------------------------------

def _make_kernel_control(params: SolverParams):
    from .ops.broadphase import control_lanes

    def kernel(nb_ref, pos_ref, quat_ref, size_ref, rad_ref, lv_ref, av_ref,
               invm_ref, anc_ref, ancq_ref, out_ref):
        lanes = control_lanes(
            nb_ref[:],
            tuple(pos_ref[k] for k in range(3)),
            tuple(quat_ref[k] for k in range(4)),
            tuple(size_ref[k] * 0.5 for k in range(3)),
            rad_ref[:],
            tuple(lv_ref[k] for k in range(3)),
            tuple(av_ref[k] for k in range(3)),
            invm_ref[:] > 0.0, anc_ref[:], ancq_ref[:], params,
            rep.select_gather,
        )
        lane = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        row = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        acc = jnp.zeros((8, 128), jnp.float32)
        for k, v in enumerate(lanes):
            acc = acc + jnp.where((row == 0) & (lane == k), v, 0.0)
        out_ref[:] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("params",))
def control_lanes_tpu(nb, b, bp, params: SolverParams):
    """Returns the (5,) f32 control block for diagnostics lanes 11-15."""
    out = pl.pallas_call(
        _make_kernel_control(params),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret_mode(),
    )(nb, b.pos, b.quat, b.size, b.radius, b.linvel, b.angvel, b.inv_mass,
      bp.anchor, bp.anchor_quat)
    return out[0, :5]


# ---------------------------------------------------------------------------
# Kernel B: prediction + iterative solve + velocities + diagnostics
# ---------------------------------------------------------------------------

def _kernel_b_math(params: SolverParams, cache: Contacts, pos_r, quat_r, lv_r,
                   av_r, plv_r, mass_r, invm_r, fric_r, inertia_r,
                   inv_inertia_r, gather=rep.select_gather, joints=None,
                   springs=None, n_colors=1, fresh=None, unroll=False,
                   n_main=None):
    """Phases 3-6 as pure array math: the body of kernel B.

    Called with VMEM-resident values inside the Pallas kernel (gather =
    select_gather, the Mosaic-friendly strategy, unroll=True), and directly
    as ordinary jitted XLA by ``solve_loop_math`` for CPU testing — same
    per-iteration ops in the same order, so the flagship backend's math is
    covered by the CPU suite.  Two value-preserving substitutions on the CPU
    twin: (1) xla_gather instead of select_gather (take_along_axis chains
    explode XLA:CPU compile time >25 min vs 6 s; value-equivalence is
    unit-tested separately); (2) unroll=False — the cadence blocks run as
    one fori loop with rebuild/ramp as data (same values, graph traced once)
    instead of the statically unrolled Mosaic form.  Returns the kernel's
    10 outputs.
    """
    dt = params.dt
    inv_dt2 = 1.0 / (dt * dt)
    total_iters = params.iterations + (1 if params.post_stabilize else 0)
    # Traced impact-boost override (CPU-twin form only; the Mosaic kernels
    # bake the boosted count in statically via params.replace): ``n_main``
    # is the effective main-iteration count, ``iters_end`` the fori bound.
    if n_main is None:
        n_main = params.iterations
        iters_end = total_iters
    else:
        iters_end = n_main + (1 if params.post_stabilize else 0)
    relax = params.relaxation
    grav = params.gravity
    g_len = float(sum(x * x for x in grav) ** 0.5)
    ghat = tuple(x / g_len for x in grav) if g_len > 1e-5 else (0.0, 0.0, 0.0)

    pos0 = tuple(pos_r[k] for k in range(3))
    quat0 = tuple(quat_r[k] for k in range(4))
    mass = mass_r[:]
    inv_mass = invm_r[:]
    inertia = tuple(inertia_r[k] for k in range(3))
    inv_inertia = tuple(inv_inertia_r[k] for k in range(3))
    dyn = inv_mass > 0.0
    dynf = dyn.astype(jnp.float32)
    san = jnp.float32(0.0)

    body = {
        "pos": pos0,
        "quat": quat0,
        "inv_mass": inv_mass,
        "friction": fric_r[:],
    }
    consts = rep.pair_constants(cache.other, body, gather)

    # ---- joints/springs: phase-2 decay (solver.cpp:281-293) and the
    # replicated row machinery (ops/joints.py, ops/springs.py) ----
    from .ops.joints import (
        joint_accumulate, joint_decay, joint_dual, joint_force,
        joint_geometry,
    )
    from .ops.springs import (
        spring_accumulate, spring_decay, spring_force, spring_geometry,
    )

    has_j = joints is not None and joints.dj > 0
    has_s = springs is not None and springs.ds > 0
    if has_j:
        joints = joint_decay(joints, params)
    if has_s:
        springs = spring_decay(springs, params)
    s_pen = springs.penalty if has_s else None
    ncol = n_colors if has_j else 1  # colors exist only for hard joints
    color = joints.color if has_j else None

    # ---- phase 3: prediction (solver.cpp:299-337) ----
    lv_in = tuple(lv_r[k] for k in range(3))
    av_in = tuple(av_r[k] for k in range(3))
    plv = tuple(plv_r[k] for k in range(3))
    lv, san = _san3(lv_in, (0.0, 0.0, 0.0), san)
    w_norm = jnp.sqrt(cm.length_sq(av_in))
    w_scale = jnp.where(
        w_norm > params.max_angular_speed,
        params.max_angular_speed / jnp.maximum(w_norm, 1e-12),
        1.0,
    )
    av = tuple(c * w_scale for c in av_in)
    av, san = _san3(av, (0.0, 0.0, 0.0), san)

    ip = tuple(
        jnp.where(dyn, pos0[k] + lv[k] * dt + grav[k] * dt * dt, pos0[k])
        for k in range(3)
    )
    omega = (av[0], av[1], av[2], jnp.zeros_like(av[0]))
    oq = cm.q_mul(omega, quat0)
    iq = _q_normalize(tuple(quat0[k] + oq[k] * (0.5 * dt) for k in range(4)))
    iq = tuple(jnp.where(dyn, iq[k], quat0[k]) for k in range(4))

    if g_len > 1e-5:
        proj = sum((lv[k] - plv[k]) / dt * ghat[k] for k in range(3))
        aw = jnp.clip(proj / g_len, 0.0, 1.0)
        aw = jnp.where(jnp.isfinite(aw), aw, 0.0)
    else:
        aw = jnp.zeros_like(mass)
    ps = tuple(
        pos0[k] + (lv[k] * dt + grav[k] * (aw * dt * dt)) * dynf
        for k in range(3)
    )
    ps, san = _san3(ps, pos0, san)
    qs = iq

    static = rep.geometry_static(cache, consts)

    def geom_at(pos, quat):
        return rep.geometry_pose(
            cache, static, {"pos": pos, "quat": quat}, consts, gather
        )

    def flat_geom(geom):
        out = []
        for s in range(4):
            out.extend(geom["rw_a"][s])
            out.extend(geom["rw_b"][s])
        out.extend(geom["sep"])
        out.extend(geom["slip1"])
        out.extend(geom["slip2"])
        return tuple(out)

    def unflat_geom(t):
        rw_a = [tuple(t[s * 6 + k] for k in range(3)) for s in range(4)]
        rw_b = [tuple(t[s * 6 + 3 + k] for k in range(3)) for s in range(4)]
        return {
            "basis": static["basis"],
            "rw_a": rw_a,
            "rw_b": rw_b,
            "sep": list(t[24:28]),
            "slip1": list(t[28:32]),
            "slip2": list(t[32:36]),
            "is_a": static["is_a"],
            "slot_ok": static["slot_ok"],
        }

    # ---- phase 4: the iterative solve (solver.cpp:340-431).  The
    # geometry evaluated by the dual pass at the post-primal poses is
    # carried into the next iteration's primal pass (one evaluation per
    # iteration, like the reference's per-iteration computeConstraint).
    # The 6x6 Hessian (penalty outer products + gyro) is rebuilt every
    # params.lhs_rebuild_every iterations and carried in between
    # (modified Newton; the gradient is always fresh so the converged
    # fixed point is unchanged).
    def one_iteration(it, carry, rebuild, ramp_pen=True):
        px, py, pz, q0, q1, q2, q3 = carry[:7]
        geom = unflat_geom(carry[7:43])
        lam, pen, stick_f = carry[43:46]
        mat = list(carry[46:70])
        if has_j:
            j_lam, j_pen = carry[70], carry[71]
        pos = (px, py, pz)
        quat = (q0, q1, q2, q3)
        stick = stick_f > 0.5
        if params.post_stabilize:
            alpha_cur = jnp.where(it < n_main, 1.0, 0.0)
        else:
            alpha_cur = jnp.float32(params.alpha)

        rows = rep.eval_rows(geom, cache, consts, lam, pen, stick, alpha_cur, params)
        f = rep.primal_force(rows, pen)

        # ``rebuild``: True = always rebuild (k=1 cadence, and every
        # iteration of the unrolled Mosaic block head); False = static
        # stale iteration (unrolled Mosaic block body); traced bool =
        # block-head test inside the single-fori CPU-twin/XLA form,
        # where one small lax.cond keeps the iteration body traced
        # exactly once per step graph.
        def _fresh_mat(_):
            iiw = _world_inertia_comps(quat, inv_inertia)
            m = rep.body_matrix(geom, f, pen, iiw)
            return tuple(m["m_ll"] + m["m_la"] + m["m_aa"] + m["gyro"])

        if rebuild is True:
            mat = list(_fresh_mat(None))
        elif rebuild is False:
            pass  # static stale iteration (unrolled Mosaic block body)
        else:
            mat = list(lax.cond(rebuild, _fresh_mat,
                                lambda _: tuple(mat), operand=None))
        m_ll, m_la, m_aa, gyro = mat[:6], mat[6:15], mat[15:21], mat[21:24]
        forces = rep.body_forces(geom, f)

        # Primal color sub-passes: contacts stay Jacobi (iteration-start
        # geometry/forces); joints/springs are Gauss-Seidel across the
        # colored hard-joint graph, re-evaluated at the newest poses per
        # pass.  Contact-only scenes take exactly one pass.
        cur_pos, cur_quat = pos, quat
        for ci in range(ncol):
            jacc = sacc = None
            if has_j:
                jg = joint_geometry(
                    joints, {"pos": cur_pos, "quat": cur_quat}, gather
                )
                fj = joint_force(jg, joints, j_lam, j_pen)
                jacc = joint_accumulate(jg, fj, j_pen)
            if has_s:
                sg = spring_geometry(
                    springs, {"pos": cur_pos, "quat": cur_quat}, gather
                )
                fs = spring_force(sg, s_pen)
                sacc = spring_accumulate(sg, fs, s_pen)

            iw = _world_inertia_comps(cur_quat, inertia)
            rhs_l = list(
                mass * (cur_pos[k] - ip[k]) * inv_dt2 + forces["F"][k]
                for k in range(3)
            )
            q_err = cm.q_mul(cur_quat, (-iq[0], -iq[1], -iq[2], iq[3]))
            sgn = jnp.where(q_err[3] < 0.0, -2.0, 2.0)
            rot = (q_err[0] * sgn, q_err[1] * sgn, q_err[2] * sgn)
            rhs_a = [
                (iw[0] * rot[0] + iw[1] * rot[1] + iw[2] * rot[2]) * inv_dt2 + forces["T"][0],
                (iw[1] * rot[0] + iw[3] * rot[1] + iw[4] * rot[2]) * inv_dt2 + forces["T"][1],
                (iw[2] * rot[0] + iw[4] * rot[1] + iw[5] * rot[2]) * inv_dt2 + forces["T"][2],
            ]

            m_dt2 = mass * inv_dt2
            a_ll = [
                m_ll[0] + m_dt2, m_ll[1], m_ll[2],
                m_ll[3] + m_dt2, m_ll[4], m_ll[5] + m_dt2,
            ]
            a_la = list(m_la)
            a_aa = [
                m_aa[0] + iw[0] * inv_dt2 + gyro[0],
                m_aa[1] + iw[1] * inv_dt2,
                m_aa[2] + iw[2] * inv_dt2,
                m_aa[3] + iw[3] * inv_dt2 + gyro[1],
                m_aa[4] + iw[4] * inv_dt2,
                m_aa[5] + iw[5] * inv_dt2 + gyro[2],
            ]
            for acc in (jacc, sacc):
                if acc is None:
                    continue
                for k in range(3):
                    rhs_l[k] = rhs_l[k] + acc["F"][k]
                    rhs_a[k] = rhs_a[k] + acc["T"][k]
                for k in range(6):
                    a_ll[k] = a_ll[k] + acc["m_ll"][k]
                    a_aa[k] = a_aa[k] + acc["m_aa"][k]
                for k in range(9):
                    a_la[k] = a_la[k] + acc["m_la"][k]

            dl, da = solve66_cm(tuple(a_ll), tuple(a_la), tuple(a_aa),
                                tuple(rhs_l), tuple(rhs_a))

            if ncol > 1:
                applyf = dynf * (color == ci).astype(jnp.float32)
                applyb = dyn & (color == ci)
            else:
                applyf, applyb = dynf, dyn
            new_pos = tuple(cur_pos[k] - relax * dl[k] * applyf for k in range(3))
            dq = cm.q_mul((da[0] * relax, da[1] * relax, da[2] * relax,
                           jnp.zeros_like(da[0])), cur_quat)
            nq = _q_normalize(tuple(cur_quat[k] - 0.5 * dq[k] for k in range(4)))
            nq = tuple(jnp.where(applyb, nq[k], cur_quat[k]) for k in range(4))
            cur_pos, cur_quat = new_pos, nq
        new_pos, nq = cur_pos, cur_quat

        geom2 = geom_at(new_pos, nq)
        rows2 = rep.eval_rows(
            geom2, cache, consts, jnp.stack(rows["lam"]), pen,
            jnp.stack(rows["stick"]), alpha_cur, params,
        )
        lam2, pen2, stick2 = rep.dual_update(rows2, geom2, pen, params.beta, params)
        do_dual = it < n_main
        lam = jnp.where(do_dual, lam2, jnp.stack(rows2["lam"]))
        # Penalty ramps only when the Hessian will be rebuilt before its
        # next use (classic augmented-Lagrangian cadence: inner Newton
        # iterations on a FIXED penalty, ramp at block boundaries).
        # Ramping mid-block while H is stale makes the gradient stiffer
        # than the curvature and pumps bounce energy (a 10-cube stack
        # never settles).  With lhs_rebuild_every=1 every iteration
        # ramps — reference-exact (solver.cpp:411-429).  ``ramp_pen``
        # may be traced (block-tail test inside the single fori body).
        if ramp_pen is not False:
            pen = jnp.where(do_dual & ramp_pen, pen2, pen)
        stick = cm.bwhere(do_dual, stick2, jnp.stack(rows2["stick"]))
        out = (new_pos[0], new_pos[1], new_pos[2], nq[0], nq[1], nq[2],
               nq[3]) + flat_geom(geom2) + (
                   lam, pen, stick.astype(jnp.float32)) + tuple(mat)
        if has_j:
            # Joint rows are always fresh in the Hessian, so their ramp
            # cadence stays per-iteration (reference-exact).
            jg2 = joint_geometry(joints, {"pos": new_pos, "quat": nq}, gather)
            j_lam2, j_pen2 = joint_dual(jg2, joints, j_lam, j_pen,
                                        params.beta, params)
            j_lam = jnp.where(do_dual, j_lam2, j_lam)
            j_pen = jnp.where(do_dual, j_pen2, j_pen)
            out = out + (j_lam, j_pen)
        return out

    geom0 = geom_at(ps, qs)
    zmat = tuple(jnp.zeros_like(mass) for _ in range(24))
    carry = (
        ps[0], ps[1], ps[2], qs[0], qs[1], qs[2], qs[3],
    ) + flat_geom(geom0) + (
        cache.lam, cache.penalty, cache.stick.astype(jnp.float32),
    ) + zmat
    if has_j:
        carry = carry + (joints.lam, joints.penalty)

    k_re = max(1, params.lhs_rebuild_every)
    if unroll and k_re > 1:
        # Mosaic fused-kernel path: statically unrolled cadence blocks
        # (rebuild/ramp as Python constants, no in-kernel cond).  The
        # cond variant below costs ~20% settled-regime throughput in
        # Mosaic (measured on Stress1000), so the TPU kernel keeps the
        # unrolled form; the CPU twin keeps the small graph.
        blocks, block_tail = divmod(total_iters, k_re)

        def block_body(bi, c):
            it0 = bi * k_re
            for j in range(k_re):
                c = one_iteration(it0 + j, c, rebuild=(j == 0),
                                  ramp_pen=(j == k_re - 1))
            return c

        if blocks > 0:
            carry = lax.fori_loop(0, blocks, block_body, carry)
        for j in range(block_tail):
            carry = one_iteration(
                jnp.int32(blocks * k_re + j), carry, rebuild=(j == 0),
                ramp_pen=(j == block_tail - 1),
            )
    else:
        if k_re > 1:
            # One fori over all iterations; rebuild on block heads
            # (it % k == 0), ramp at block tails and the final
            # iteration — value-identical to the unrolled-block
            # structure, with the iteration body traced exactly once.
            # ``fresh`` (traced bool, CPU twin only) folds the speed
            # gate in: a fresh step rebuilds and ramps every iteration,
            # the exact k=1 cadence.
            def loop_body(it, c):
                j = it % k_re
                rb = j == 0
                rp = (j == k_re - 1) | (it == iters_end - 1)
                if fresh is not None:
                    rb = rb | fresh
                    rp = rp | fresh
                return one_iteration(it, c, rebuild=rb, ramp_pen=rp)
        else:

            def loop_body(it, c):
                return one_iteration(it, c, rebuild=True, ramp_pen=True)

        carry = lax.fori_loop(0, iters_end, loop_body, carry)
    px, py, pz, q0, q1, q2, q3 = carry[:7]
    geom_f = unflat_geom(carry[7:43])
    lam, pen, stick_f = carry[43:46]
    j_lam_f, j_pen_f = (carry[70], carry[71]) if has_j else (None, None)
    pos_f = (px, py, pz)
    quat_f = (q0, q1, q2, q3)
    pos_f, san = _san3(pos_f, pos0, san)
    quat_f, san = _san4(quat_f, quat0, san)

    # ---- phase 5: velocity reconstruction + damping (solver.cpp:433-469)
    nlv = tuple(
        jnp.where(dyn, (pos_f[k] - pos0[k]) / dt * params.linear_damping, lv_in[k])
        for k in range(3)
    )
    dqv = cm.q_mul(quat_f, (-quat0[0], -quat0[1], -quat0[2], quat0[3]))
    vsgn = jnp.where(dqv[3] < 0.0, -2.0, 2.0)
    nav = tuple(
        jnp.where(dyn, dqv[k] * vsgn / dt * params.angular_damping, av_in[k])
        for k in range(3)
    )
    nlv, san = _san3(nlv, (0.0, 0.0, 0.0), san)
    nav, san = _san3(nav, (0.0, 0.0, 0.0), san)

    # Slow once-per-step joint dual tracker (ops/joints.joint_dual_ema)
    # on the final poses — same math as solver.step's XLA path.
    if has_j and params.joint_ema_rate > 0.0:
        from .ops.joints import joint_dual_ema

        jgf = joint_geometry(joints, {"pos": pos_f, "quat": quat_f}, gather)
        j_lam_f = joint_dual_ema(jgf, joints, j_lam_f, j_pen_f, params)

    # ---- phase 6: diagnostics (solver.cpp:471-513) ----
    # geom_f is the loop's final geometry, evaluated at the final poses
    # (the sanitize above only changes poses in pathological NaN cases).
    other_dyn = gather(dynf, consts["idx"]) > 0.5
    iota = rep.body_iota(dynf.shape[0])[None]
    once = consts["valid"] & ((iota < consts["idx"]) | ~other_dyn)

    max_pen = jnp.float32(0.0)
    max_drift = jnp.float32(0.0)
    max_lam_n = jnp.float32(0.0)
    for s in range(4):
        ok = geom_f["slot_ok"][s]
        sep = geom_f["sep"][s]
        max_pen = jnp.maximum(max_pen, jnp.max(jnp.where(ok, -sep, 0.0)))
        max_drift = jnp.maximum(
            max_drift, jnp.max(jnp.where(ok, params.penetration_slop - sep, 0.0))
        )
        max_lam_n = jnp.maximum(
            max_lam_n, jnp.max(jnp.where(ok, jnp.abs(lam[s * 3]), 0.0))
        )
    max_pen = jnp.maximum(max_pen, 0.0)
    max_drift = jnp.maximum(max_drift, 0.0)

    oncef = once.astype(jnp.float32)
    n_contacts = jnp.sum(jnp.where(once, cache.count, 0).astype(jnp.float32))
    n_manifolds = jnp.sum(oncef * (cache.count > 0).astype(jnp.float32))
    n_dyn = jnp.sum(dynf)
    max_lin = jnp.max(jnp.sqrt(cm.length_sq(nlv)) * dynf)
    max_ang = jnp.max(jnp.sqrt(cm.length_sq(nav)) * dynf)

    lane = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    diag_vals = (max_pen, max_drift, max_lin, max_ang, max_lam_n,
                 n_contacts, n_manifolds, n_dyn, san)
    acc = jnp.zeros((8, 128), jnp.float32)
    for k, v in enumerate(diag_vals):
        acc = acc + jnp.where((row == 0) & (lane == k), v, 0.0)

    out = (
        jnp.stack(pos_f),
        jnp.stack(quat_f),
        jnp.stack(nlv),
        jnp.stack(nav),
        jnp.stack(tuple(jnp.where(dyn, lv[k], plv[k]) for k in range(3))),
        jnp.stack(tuple(jnp.where(dyn, av[k], av_in[k]) for k in range(3))),
        lam,
        pen,
        stick_f,
        acc,
    )
    if has_j:
        out = out + (j_lam_f, j_pen_f)
    if has_s:
        out = out + (s_pen,)
    return out


def _make_kernel_b(params: SolverParams):
    def kernel(*refs):
        cache = _read_cache(refs[:12])
        body_arrs = [r[:] for r in refs[12:22]]
        outs = _kernel_b_math(params, cache, *body_arrs, unroll=True)
        for ref, val in zip(refs[-10:], outs):
            ref[:] = val

    return kernel


# ---------------------------------------------------------------------------
# Fused step kernel: symmetric filter + narrowphase + match + solve in ONE
# pallas_call (saves a kernel launch plus a full HBM round-trip of the
# ~6 MB contact cache between kernels A and B).
# ---------------------------------------------------------------------------

import dataclasses as _dc
from typing import Any as _Any


def _view_pytree(cls):
    fields = [f.name for f in _dc.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_view_pytree
@_dc.dataclass(frozen=True)
class _JView:
    """In-kernel view of the replicated joint arrays (state.Joints minus the
    dense build-time fields, which never enter the kernels)."""

    other: _Any; world: _Any; side: _Any
    anchor_a: _Any; anchor_b: _Any; rest: _Any
    stiff_lin: _Any; stiff_ang: _Any; rmotor: _Any
    lam: _Any; penalty: _Any; color: _Any

    @property
    def dj(self):
        return self.other.shape[0]

    def replace(self, **kw):
        return _dc.replace(self, **kw)


_JFIELDS = ("other", "world", "side", "anchor_a", "anchor_b", "rest",
            "stiff_lin", "stiff_ang", "rmotor", "lam", "penalty", "color")


@_view_pytree
@_dc.dataclass(frozen=True)
class _SView:
    other: _Any; world: _Any; side: _Any
    anchor_a: _Any; anchor_b: _Any; rrest: _Any; rstiff: _Any
    penalty: _Any

    @property
    def ds(self):
        return self.other.shape[0]

    def replace(self, **kw):
        return _dc.replace(self, **kw)


_SFIELDS = ("other", "world", "side", "anchor_a", "anchor_b", "rrest",
            "rstiff", "penalty")


def _make_kernel_step(params: SolverParams, dj: int, ds: int, n_colors: int):
    from .ops.broadphase import control_lanes, symmetric_filter

    def kernel(*refs):
        old = _read_cache(refs[:12])
        nb_raw = refs[12][:]
        keys = refs[13][:]
        thr = refs[14][:]
        (pos_r, quat_r, size_r, rad_r, lv_r, av_r, plv_r, mass_r, invm_r,
         fric_r, inertia_r, inv_inertia_r, anchor_r, anchor_q_r) = [
            r[:] for r in refs[15:29]
        ]
        at = 29
        joints = springs = None
        if dj:
            joints = _JView(*[refs[at + i][:] for i in range(len(_JFIELDS))])
            at += len(_JFIELDS)
        if ds:
            springs = _SView(*[refs[at + i][:] for i in range(len(_SFIELDS))])
            at += len(_SFIELDS)
        out_refs = refs[at:]

        body = {
            "pos": tuple(pos_r[k] for k in range(3)),
            "quat": tuple(quat_r[k] for k in range(4)),
            "half": tuple(size_r[k] * 0.5 for k in range(3)),
            "inv_mass": invm_r,
            "friction": fric_r,
        }
        neighbors, kept = symmetric_filter(
            nb_raw, keys, thr, invm_r > 0.0, rep.select_gather
        )
        new, dropped = rep.collide_and_init(
            old, neighbors, body, params, rep.select_gather
        )
        outs = _kernel_b_math(
            params, new, pos_r, quat_r, lv_r, av_r, plv_r, mass_r, invm_r,
            fric_r, inertia_r, inv_inertia_r, joints=joints, springs=springs,
            n_colors=n_colors, unroll=True,
        )
        # Step-control block (state.Diagnostics lanes 11-15) on the FINAL
        # poses/velocities, so the next step's gates (broadphase refresh,
        # stale-Hessian cadence, ballistic) are pure scalar logic with no
        # extra reductions or probe launches in the host step graph.
        ctrl = control_lanes(
            nb_raw,
            tuple(outs[0][k] for k in range(3)),
            tuple(outs[1][k] for k in range(4)),
            body["half"], rad_r,
            tuple(outs[2][k] for k in range(3)),
            tuple(outs[3][k] for k in range(3)),
            invm_r > 0.0, anchor_r, anchor_q_r, params, rep.select_gather,
        )
        cache_out = _cache_to_args(new)
        cache_out[_CACHE_FIELDS.index("lam")] = outs[6]
        cache_out[_CACHE_FIELDS.index("penalty")] = outs[7]
        cache_out[_CACHE_FIELDS.index("stick")] = outs[8]
        lane = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        row = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        diag = outs[9] + jnp.where(
            (row == 0) & (lane == 9), kept.astype(jnp.float32), 0.0
        )
        for k, v in enumerate(ctrl):
            diag = diag + jnp.where((row == 0) & (lane == 10 + k), v, 0.0)
        diag = diag + jnp.where(
            (row == 0) & (lane == 15), dropped.astype(jnp.float32), 0.0
        )
        vals = cache_out + list(outs[:6]) + [diag] + list(outs[10:])
        for ref, val in zip(out_refs, vals):
            ref[:] = val

    return kernel


@functools.partial(jax.jit, static_argnames=("params", "n_colors"))
def step_kernel_tpu(old: Contacts, nb_raw, keys, thr, b, anchor, anchor_quat,
                    joints, springs, params: SolverParams, n_colors: int = 1):
    """One fused kernel: phases 2-6 plus the end-of-step control block.
    Returns (contacts', bodies', diag, kept, j_lam, j_pen, s_pen) — the
    last three None when the scene has no joints/springs.  ``anchor``/
    ``anchor_quat``: the broadphase-cache anchor poses (the control block's
    deviation lanes are measured against them)."""
    dj = joints.other.shape[0] if joints is not None else 0
    ds = springs.other.shape[0] if springs is not None else 0
    in_args = _cache_to_args(old) + [
        nb_raw, keys, thr, b.pos, b.quat, b.size, b.radius, b.linvel,
        b.angvel, b.prev_linvel, b.mass, b.inv_mass, b.friction, b.inertia,
        b.inv_inertia, anchor, anchor_quat,
    ]
    if dj:
        in_args += [getattr(joints, f) for f in _JFIELDS]
    if ds:
        in_args += [getattr(springs, f) for f in _SFIELDS]
    shp = jax.ShapeDtypeStruct
    g = old.other.shape[1]
    out_shape = [shp(a.shape, a.dtype) for a in _cache_to_args(old)] + [
        shp((3, g, 128), jnp.float32),      # pos
        shp((4, g, 128), jnp.float32),      # quat
        shp((3, g, 128), jnp.float32),      # linvel
        shp((3, g, 128), jnp.float32),      # angvel
        shp((3, g, 128), jnp.float32),      # prev_linvel
        shp((3, g, 128), jnp.float32),      # prev_angvel
        shp((8, 128), jnp.float32),         # diagnostics (+kept at lane 9)
    ]
    if dj:
        out_shape += [shp((6, dj, g, 128), jnp.float32)] * 2   # j_lam, j_pen
    if ds:
        out_shape += [shp((ds, g, 128), jnp.float32)]          # s_pen
    outs = pl.pallas_call(
        _make_kernel_step(params, dj, ds, n_colors),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(in_args),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shape),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret_mode(),
    )(*in_args)
    contacts = _args_to_cache(outs[:12])
    bodies = b.replace(
        pos=outs[12], quat=outs[13], linvel=outs[14], angvel=outs[15],
        prev_linvel=outs[16], prev_angvel=outs[17],
    )
    diag = outs[18]
    at = 19
    j_lam = j_pen = s_pen = None
    if dj:
        j_lam, j_pen = outs[at], outs[at + 1]
        at += 2
    if ds:
        s_pen = outs[at]
    return contacts, bodies, diag, diag[0, 9].astype(jnp.int32), j_lam, j_pen, s_pen


@functools.partial(jax.jit, static_argnames=("params",))
def solve_loop_tpu(contacts: Contacts, b, params: SolverParams):
    """Phases 3-6 in one kernel.  Returns (bodies', lam, pen, stick, diag)."""
    d, g, _ = contacts.other.shape
    in_args = _cache_to_args(contacts) + [
        b.pos, b.quat, b.linvel, b.angvel, b.prev_linvel,
        b.mass, b.inv_mass, b.friction, b.inertia, b.inv_inertia,
    ]
    shp = jax.ShapeDtypeStruct
    out_shape = [
        shp((3, g, 128), jnp.float32),      # pos
        shp((4, g, 128), jnp.float32),      # quat
        shp((3, g, 128), jnp.float32),      # linvel
        shp((3, g, 128), jnp.float32),      # angvel
        shp((3, g, 128), jnp.float32),      # prev_linvel
        shp((3, g, 128), jnp.float32),      # prev_angvel
        shp((12, d, g, 128), jnp.float32),  # lam
        shp((12, d, g, 128), jnp.float32),  # penalty
        shp((4, d, g, 128), jnp.float32),   # stick
        shp((8, 128), jnp.float32),         # diagnostics vector
    ]
    outs = pl.pallas_call(
        _make_kernel_b(params),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(in_args),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shape),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret_mode(),
    )(*in_args)
    bodies = b.replace(
        pos=outs[0], quat=outs[1], linvel=outs[2], angvel=outs[3],
        prev_linvel=outs[4], prev_angvel=outs[5],
    )
    return bodies, outs[6], outs[7], outs[8] > 0.5, outs[9]


# ---------------------------------------------------------------------------
# Pure-math twins: the identical kernel bodies as plain jitted XLA.
#
# These run the exact functions the Pallas kernels execute (same ops, same op
# order) without pallas_call, so the flagship backend's math is testable on
# CPU where Mosaic compilation is unavailable and interpret mode is
# prohibitively slow to compile (~16 min for kernel B).  Off-TPU they swap
# select_gather for xla_gather (same values — asserted by
# tests/test_pallas_backend.py — but ~100x faster XLA:CPU compiles).
# ---------------------------------------------------------------------------

def _math_gather():
    return rep.select_gather if jax.default_backend() == "tpu" else rep.xla_gather


@functools.partial(jax.jit, static_argnames=("params",))
def collide_and_init_math(old: Contacts, nb_raw, keys, thr, b, params: SolverParams):
    from .ops.broadphase import symmetric_filter

    body = {
        "pos": tuple(b.pos[k] for k in range(3)),
        "quat": tuple(b.quat[k] for k in range(4)),
        "half": tuple(b.size[k] * 0.5 for k in range(3)),
        "inv_mass": b.inv_mass,
        "friction": b.friction,
    }
    gather = _math_gather()
    neighbors, kept = symmetric_filter(nb_raw, keys, thr, b.inv_mass > 0.0, gather)
    contacts, dropped = rep.collide_and_init(old, neighbors, body, params, gather)
    return contacts, kept, dropped


@functools.partial(jax.jit, static_argnames=("params", "n_colors"))
def solve_loop_math(contacts: Contacts, b, params: SolverParams, joints=None,
                    springs=None, n_colors: int = 1, fresh=None, n_main=None):
    outs = _kernel_b_math(
        params, contacts, b.pos, b.quat, b.linvel, b.angvel, b.prev_linvel,
        b.mass, b.inv_mass, b.friction, b.inertia, b.inv_inertia,
        gather=_math_gather(), joints=joints, springs=springs,
        n_colors=n_colors, fresh=fresh, n_main=n_main,
    )
    bodies = b.replace(
        pos=outs[0], quat=outs[1], linvel=outs[2], angvel=outs[3],
        prev_linvel=outs[4], prev_angvel=outs[5],
    )
    has_j = joints is not None and joints.other.shape[0] > 0
    has_s = springs is not None and springs.other.shape[0] > 0
    at = 10
    j_lam = j_pen = s_pen = None
    if has_j:
        j_lam, j_pen = outs[at], outs[at + 1]
        at += 2
    if has_s:
        s_pen = outs[at]
    return bodies, outs[6], outs[7], outs[8] > 0.5, outs[9], j_lam, j_pen, s_pen


# ---------------------------------------------------------------------------
# Full step
# ---------------------------------------------------------------------------

def step_pallas(world: World, params: SolverParams, cap: Capacity,
                refreshed=None) -> World:
    """Broadphase in XLA; phases 2-6 in one fused mega-kernel that also
    emits the next step's control block (state.Diagnostics lanes 11-15).

    ``refreshed``: the broadphase-refresh flag when the caller (solver.step)
    already ran the scalar-gated refresh; None = do it here (direct callers
    and tests).  Off-TPU (CPU tests, forced ``backend='pallas'``) the
    identical math runs through the pure-XLA twins instead of pallas_call —
    same functions, no Mosaic."""
    from .ops.broadphase import refresh_scalar
    from .solver import attach_control, control_gates

    b = world.bodies
    on_tpu = jax.default_backend() == "tpu"

    if refreshed is None:
        bp, refreshed = refresh_scalar(
            world.bp, world.diagnostics.vec, b, world.exclusions,
            cap.max_degree, params.bp_margin, window=cap.bp_window,
        )
        world = world.replace(bp=bp)
    else:
        bp = world.bp
    stale_ok_gate, calm = control_gates(
        world.diagnostics.vec, refreshed, params
    )
    has_j = world.joints.dj > 0
    has_s = world.springs.ds > 0
    jin = world.joints if has_j else None
    sin = world.springs if has_s else None
    n_colors = cap.joint_colors

    if on_tpu:
        def run(par):
            jv = _JView(*(getattr(jin, f) for f in _JFIELDS)) if has_j else None
            sv = _SView(*(getattr(sin, f) for f in _SFIELDS)) if has_s else None
            return step_kernel_tpu(
                world.contacts, bp.nb, bp.key, bp.thr, b, bp.anchor,
                bp.anchor_quat, jv, sv, par, n_colors
            )
    else:
        def run(par, fresh=None, n_main=None):
            contacts, kept, dropped = collide_and_init_math(
                world.contacts, bp.nb, bp.key, bp.thr, b, par
            )
            bodies, lam, pen, stick, diag_v, j_lam, j_pen, s_pen = solve_loop_math(
                contacts, b, par, jin, sin, n_colors, fresh, n_main
            )
            contacts = contacts.replace(lam=lam, penalty=pen, stick=stick)
            diag_v = diag_v.at[0, 15].add(dropped.astype(jnp.float32))
            return contacts, bodies, diag_v, kept, j_lam, j_pen, s_pen

    # Impact iteration boost (config.impact_iterations): energetic
    # near-contact steps run the boosted sweep count.  On TPU this is one
    # more statically-baked kernel variant under the gate cond; the CPU
    # twin threads the boosted count in as a traced scalar.  Compiled out
    # when the scene already runs >= impact_iterations.
    boost = 0 < params.iterations < params.impact_iterations
    if boost:
        boost_par = params.replace(iterations=params.impact_iterations)

    if params.lhs_rebuild_every > 1:
        # Speed-gated Hessian staleness (config.lhs_rebuild_every):
        # energetic near-contact steps rebuild/ramp every iteration.  On
        # TPU this picks between two (small, single-fori) kernel variants;
        # the CPU twin folds the gate in as a traced boolean so the step
        # graph is traced once (same values either way).
        k_fr = max(1, params.lhs_fresh_rebuild_every)
        if k_fr == params.lhs_rebuild_every and not boost:
            # Energetic cadence == calm cadence (and no iteration boost):
            # the fresh/calm branches would compile two identical kernels —
            # skip the gate entirely.
            contacts, bodies, diag_v, kept, j_lam, j_pen, s_pen = run(params)
        elif on_tpu or k_fr > 1:
            fresh_gate = jnp.logical_not(stale_ok_gate)
            if boost:
                # calm <= (not fresh_gate): the calm branch always runs the
                # stale cadence at scene iterations; the energetic branch
                # runs boosted iterations with cadence per the fresh gate.
                outs = lax.cond(
                    calm,
                    lambda _: run(params),
                    lambda _: lax.cond(
                        fresh_gate,
                        lambda __: run(boost_par.replace(lhs_rebuild_every=k_fr)),
                        lambda __: run(boost_par),
                        operand=None,
                    ),
                    operand=None,
                )
            else:
                outs = lax.cond(
                    fresh_gate,
                    lambda _: run(params.replace(lhs_rebuild_every=k_fr)),
                    lambda _: run(params),
                    operand=None,
                )
            contacts, bodies, diag_v, kept, j_lam, j_pen, s_pen = outs
        else:
            fresh = jnp.logical_not(stale_ok_gate)
            n_main = None
            if boost:
                n_main = jnp.where(
                    calm, params.iterations, params.impact_iterations
                )
            contacts, bodies, diag_v, kept, j_lam, j_pen, s_pen = run(
                params, fresh=fresh, n_main=n_main
            )
    elif boost:
        if on_tpu:
            contacts, bodies, diag_v, kept, j_lam, j_pen, s_pen = lax.cond(
                calm,
                lambda _: run(params),
                lambda _: run(boost_par),
                operand=None,
            )
        else:
            n_main = jnp.where(calm, params.iterations, params.impact_iterations)
            contacts, bodies, diag_v, kept, j_lam, j_pen, s_pen = run(
                params, n_main=n_main
            )
    else:
        contacts, bodies, diag_v, kept, j_lam, j_pen, s_pen = run(params)
    overflow = bp.cand - kept
    joints = world.joints.replace(lam=j_lam, penalty=j_pen) if has_j else world.joints
    springs = world.springs.replace(penalty=s_pen) if has_s else world.springs

    # Kernel diag row layout: lanes 0-7 reference diagnostics, 8 sanitized,
    # 9 kept directed slots, 10-14 the control block, 15 dropped manifolds.
    # State-vector layout: 0-8 same, 9 pair_overflow, 10 degree_overflow,
    # 11-15 control (state.Diagnostics).
    dv = diag_v[0]
    counters = jnp.stack([overflow.astype(jnp.float32), dv[15]])
    diag = Diagnostics(vec=jnp.concatenate([dv[:9], counters, dv[10:15]]))
    out = world.replace(
        bodies=bodies,
        contacts=contacts,
        joints=joints,
        springs=springs,
        step_index=world.step_index + 1,
        diagnostics=diag,
    )
    if on_tpu:
        return out
    # CPU twins don't carry the control lanes through the kernel outputs;
    # fill them with the identical XLA computation.
    return attach_control(out, params)


# ---------------------------------------------------------------------------
# Gridded large-N backend (2048 < N): the same physics with the kernels
# blocked over body groups.
#
# The monolithic fused kernel keeps every (D, G, 128) array in one program;
# this environment's Mosaic compile helper is OOM-killed once G reaches 33
# (4224 bodies) — the compiler, not VMEM, is the ceiling.  Here each
# pallas_call grids over blocks of GB groups: per-program shapes are
# (D, GB, 128) (small, compiles like the proven G<=16 programs) while the
# cross-body pose gathers read FULL (G, 128) tables passed unblocked.
#
# Kernel A grids trivially (narrowphase/match are body-local).  The solver
# loop runs ``Capacity.grid_residency`` iterations PER gridded launch
# (block-Jacobi across blocks): within a launch each program keeps its own
# block's poses fresh every iteration — it updates its rows of the pose
# table in VMEM (dynamic_update_slice at the program offset) so intra-block
# partners are exact — while OTHER blocks' partner poses stay at their
# launch-start values (they are refreshed from the written-back table at
# the next launch, so cross-block staleness is bounded by the residency).
# Contact rows are Jacobi across bodies anyway, so the only semantic delta
# vs the fused kernel is that bounded cross-block pose lag — validated by
# the large-N envelope probe/test (round 5; the per-iteration-launch
# predecessor carried a (36, D, G, 128) geometry plane + the Hessian
# through HBM every iteration and ran 79 steps/s at 4096 where this form
# needs ~1/residency the launches and no geometry traffic).
# Prediction and finalize reuse the portable XLA implementations
# (solver.predict / solver.finalize) — cheap elementwise stages.
# Contact-only for now: scenes with joints/springs above 2048 bodies take
# the XLA path.
# ---------------------------------------------------------------------------

_CACHE_BLOCK_FIELDS = (
    "other", "count", "feature", "r_a", "r_b", "normal",
    "stick", "c0_n", "c0_t1", "c0_t2", "lam", "penalty",
)


def _blk_spec(shape, gb):
    """BlockSpec blocking the G axis (always third-from-last) of a
    replicated array; all other axes whole."""
    g_ax = len(shape) - 2
    blk = tuple(gb if a == g_ax else s for a, s in enumerate(shape))

    def imap(i):
        return tuple(i if a == g_ax else 0 for a in range(len(shape)))

    return pl.BlockSpec(blk, imap)


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape))


def _block_iota(pid, gb):
    """(GB, 128) global body indices of grid block ``pid``."""
    return (
        (pid * gb + lax.broadcasted_iota(jnp.int32, (gb, 128), 0)) * 128
        + lax.broadcasted_iota(jnp.int32, (gb, 128), 1)
    )


def _pick_gb(g):
    """Per-program group count: the largest multiple-of-8 divisor of G that
    is <= 16 (Pallas block shapes need the sublane dim divisible by 8;
    scenes above 2048 bodies are padded so G is a multiple of 8)."""
    for gb in (16, 8):
        if g % gb == 0:
            return gb
    raise ValueError(f"grid backend needs G divisible by 8, got G={g}")


def _make_kernel_a_grid(params: SolverParams, gb: int, n_total: int):
    from .ops.broadphase import symmetric_filter

    def kernel(*refs):
        pid = pl.program_id(0)
        own_iota = _block_iota(pid, gb)
        old = _read_cache(refs[:12])
        nb_blk = refs[12][:]
        keys_blk = refs[13][:]
        (pos_b, quat_b, size_b, invm_b, fric_b) = [r[:] for r in refs[14:19]]
        thr_full = refs[19][:]
        (pos_t, quat_t, size_t, invm_t, fric_t) = [r[:] for r in refs[20:25]]
        out_refs = refs[25:]

        body = {
            "pos": tuple(pos_b[k] for k in range(3)),
            "quat": tuple(quat_b[k] for k in range(4)),
            "half": tuple(size_b[k] * 0.5 for k in range(3)),
            "inv_mass": invm_b,
            "friction": fric_b,
        }
        table = {
            "pos": tuple(pos_t[k] for k in range(3)),
            "quat": tuple(quat_t[k] for k in range(4)),
            "half": tuple(size_t[k] * 0.5 for k in range(3)),
            "inv_mass": invm_t,
            "friction": fric_t,
        }
        neighbors, _ = symmetric_filter(
            nb_blk, keys_blk, thr_full, invm_t > 0.0, rep.select_gather,
            own_iota, n_total,
        )
        new, dropped = rep.collide_and_init(
            old, neighbors, body, params, rep.select_gather, own_iota, table
        )
        # Pair dedup mask for diagnostics counting (one replica per pair).
        valid = new.other >= 0
        idx = jnp.where(valid, new.other, 0)
        other_dyn = rep.select_gather(
            (invm_t > 0.0).astype(jnp.float32), idx
        ) > 0.5
        once = valid & ((own_iota[None] < idx) | ~other_dyn)

        # Per-block dropped-manifold count parked at the block's (0, 0)
        # cell; the host sums the assembled plane.
        brow = lax.broadcasted_iota(jnp.int32, (gb, 128), 0)
        blane = lax.broadcasted_iota(jnp.int32, (gb, 128), 1)
        drop_plane = jnp.where(
            (brow == 0) & (blane == 0), dropped.astype(jnp.float32), 0.0
        )

        vals = _cache_to_args(new) + [
            (neighbors >= 0).astype(jnp.float32),
            once.astype(jnp.float32),
            drop_plane,
        ]
        for ref, val in zip(out_refs, vals):
            ref[:] = val

    return kernel


def _collide_grid_math(old: Contacts, nb_raw, keys, thr, b,
                       params: SolverParams, gb: int):
    """Off-TPU twin of gridded kernel A: same block decomposition, plain
    XLA with xla_gather."""
    from .ops.broadphase import symmetric_filter

    d, g, _ = nb_raw.shape

    def blk(x, pid):
        g_ax = x.ndim - 2
        return lax.slice_in_dim(x, pid * gb, (pid + 1) * gb, axis=g_ax)

    dyn_t = b.inv_mass > 0.0
    table = {
        "pos": tuple(b.pos[k] for k in range(3)),
        "quat": tuple(b.quat[k] for k in range(4)),
        "half": tuple(b.size[k] * 0.5 for k in range(3)),
        "inv_mass": b.inv_mass,
        "friction": b.friction,
    }
    caches, kepts, onces, drops = [], [], [], []
    for pid in range(g // gb):
        own_iota = _block_iota(pid, gb)
        old_blk = jax.tree_util.tree_map(lambda x: blk(x, pid), old)
        body = {
            "pos": tuple(blk(b.pos, pid)[k] for k in range(3)),
            "quat": tuple(blk(b.quat, pid)[k] for k in range(4)),
            "half": tuple(blk(b.size, pid)[k] * 0.5 for k in range(3)),
            "inv_mass": blk(b.inv_mass, pid),
            "friction": blk(b.friction, pid),
        }
        neighbors, _ = symmetric_filter(
            blk(nb_raw, pid), blk(keys, pid), thr, dyn_t, rep.xla_gather,
            own_iota, g * 128,
        )
        new, dropped = rep.collide_and_init(
            old_blk, neighbors, body, params, rep.xla_gather, own_iota, table
        )
        valid = new.other >= 0
        idx = jnp.where(valid, new.other, 0)
        other_dyn = rep.xla_gather(dyn_t.astype(jnp.float32), idx) > 0.5
        onces.append(valid & ((own_iota[None] < idx) | ~other_dyn))
        kepts.append((neighbors >= 0).astype(jnp.float32))
        caches.append(new)
        drops.append(dropped)

    def cat(leaves):
        return jnp.concatenate(leaves, axis=leaves[0].ndim - 2)

    cache = jax.tree_util.tree_map(lambda *xs: cat(list(xs)), *caches)
    return cache, cat(kepts), cat(onces), sum(drops)


@functools.partial(jax.jit, static_argnames=("params",))
def collide_and_init_grid(old: Contacts, nb_raw, keys, thr, b,
                          params: SolverParams):
    """Gridded kernel A.  Returns (contacts, keptmask, once, dropped)."""
    d, g, _ = nb_raw.shape
    gb = _pick_gb(g)
    if _interpret_mode():
        return _collide_grid_math(old, nb_raw, keys, thr, b, params, gb)
    cache_args = _cache_to_args(old)
    in_args = cache_args + [nb_raw, keys, b.pos, b.quat, b.size, b.inv_mass,
                            b.friction, thr, b.pos, b.quat, b.size,
                            b.inv_mass, b.friction]
    in_specs = (
        [_blk_spec(a.shape, gb) for a in cache_args]
        + [_blk_spec(nb_raw.shape, gb), _blk_spec(keys.shape, gb)]
        + [_blk_spec(b.pos.shape, gb), _blk_spec(b.quat.shape, gb),
           _blk_spec(b.size.shape, gb), _blk_spec(b.inv_mass.shape, gb),
           _blk_spec(b.friction.shape, gb)]
        + [_full_spec(thr.shape), _full_spec(b.pos.shape),
           _full_spec(b.quat.shape), _full_spec(b.size.shape),
           _full_spec(b.inv_mass.shape), _full_spec(b.friction.shape)]
    )
    shp = jax.ShapeDtypeStruct
    dc = old.other.shape[0]
    out_shape = [shp(a.shape, a.dtype) for a in cache_args] + [
        shp((d, g, 128), jnp.float32),   # keptmask (candidate width)
        shp((dc, g, 128), jnp.float32),  # once (cache width)
        shp((g, 128), jnp.float32),      # per-block dropped-manifold counts
    ]
    out_specs = [_blk_spec(s.shape, gb) for s in out_shape]
    outs = pl.pallas_call(
        _make_kernel_a_grid(params, gb, g * 128),
        grid=(g // gb,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret_mode(),
    )(*in_args)
    return (_args_to_cache(outs[:12]), outs[12], outs[13] > 0.5,
            jnp.sum(outs[14]).astype(jnp.int32))


def _iterblock_grid_math(params, spec, gb, pid, own_iota, cache, lam, pen,
                         stick_f, body_const, ip, iq, pos, quat, table_pos,
                         table_quat, invm_t, fric_t, gather):
    """``len(spec)`` solver iterations for one body block, resident in one
    launch.

    ``spec``: static per-iteration flags (alpha, do_dual, rebuild, ramp) —
    launch count and cadence are compile-time structure, so there is no
    traced control flow in the kernel.  Mirrors _kernel_b_math's iteration
    (same row math, solver.cpp:340-431) with partner poses gathered from
    the launch-start full pose table through a two-level fix-up gather:
    slots whose partner lies in THIS block take the block's current
    (per-iteration fresh) values instead — Mosaic lowers the extra
    (GB, 128) local gather for ~the cost of one more select chain, where a
    traced-offset table update (dynamic_update_slice) has no TPU lowering.
    Other blocks' poses hold their launch-start values (bounded
    block-Jacobi lag, refreshed from the written-back carry at the next
    launch).

    ``pos``/``quat``: the block's own poses (3/4, GB, 128) — the same data
    as the table rows at the program offset, delivered blocked because
    in-kernel dynamic_slice is likewise unavailable.

    Returns (pos (3,GB,128), quat (4,GB,128), lam, pen, stick_f, sep
    (4,D,GB,128) — the last dual geometry's raw separations).
    """
    dt = params.dt
    inv_dt2 = 1.0 / (dt * dt)
    relax = params.relaxation
    mass = body_const["mass"]
    inertia = body_const["inertia"]
    inv_inertia = body_const["inv_inertia"]
    dyn = body_const["inv_mass"] > 0.0
    dynf = dyn.astype(jnp.float32)

    consts = rep.pair_constants(
        cache.other,
        {"friction": body_const["friction"], "inv_mass": body_const["inv_mass"]},
        gather,
        {"friction": fric_t, "inv_mass": invm_t},
    )
    static = rep.geometry_static(cache, consts, own_iota)

    blk0 = pid * (gb * 128)

    def gather_fix(tab, idx):
        """Gather from a (full_table, fresh_block) pair: launch-start table
        values, overlaid with the block's current values for intra-block
        partners."""
        if not isinstance(tab, tuple):
            return gather(tab, idx)
        full, fresh = tab
        out = gather(full, idx)
        loc = idx - blk0
        in_blk = (loc >= 0) & (loc < gb * 128)
        own = gather(fresh, jnp.where(in_blk, loc, 0))
        return jnp.where(in_blk, own, out)

    def paired_table(p, q):
        return {
            "pos": tuple((table_pos[k], p[k]) for k in range(3)),
            "quat": tuple((table_quat[k], q[k]) for k in range(4)),
        }

    stick = stick_f > 0.5
    geom = None

    for j, (alpha, do_dual, rebuild, ramp) in enumerate(spec):
        if j == 0:
            geom = rep.geometry_pose(
                cache, static, {"pos": pos, "quat": quat}, consts,
                gather_fix, paired_table(pos, quat),
            )
        alpha_cur = jnp.float32(alpha)
        rows = rep.eval_rows(geom, cache, consts, lam, pen, stick, alpha_cur,
                             params)
        f = rep.primal_force(rows, pen)

        iw = _world_inertia_comps(quat, inertia)
        if rebuild or j == 0:  # no Hessian carry across launches
            iiw = _world_inertia_comps(quat, inv_inertia)
            m = rep.body_matrix(geom, f, pen, iiw)
            m_ll, m_la = m["m_ll"], m["m_la"]
            m_aa, gyro = m["m_aa"], m["gyro"]
        forces = rep.body_forces(geom, f)

        rhs_l = tuple(
            mass * (pos[k] - ip[k]) * inv_dt2 + forces["F"][k] for k in range(3)
        )
        q_err = cm.q_mul(quat, (-iq[0], -iq[1], -iq[2], iq[3]))
        sgn = jnp.where(q_err[3] < 0.0, -2.0, 2.0)
        rot = (q_err[0] * sgn, q_err[1] * sgn, q_err[2] * sgn)
        rhs_a = (
            (iw[0] * rot[0] + iw[1] * rot[1] + iw[2] * rot[2]) * inv_dt2 + forces["T"][0],
            (iw[1] * rot[0] + iw[3] * rot[1] + iw[4] * rot[2]) * inv_dt2 + forces["T"][1],
            (iw[2] * rot[0] + iw[4] * rot[1] + iw[5] * rot[2]) * inv_dt2 + forces["T"][2],
        )
        m_dt2 = mass * inv_dt2
        a_ll = (
            m_ll[0] + m_dt2, m_ll[1], m_ll[2],
            m_ll[3] + m_dt2, m_ll[4], m_ll[5] + m_dt2,
        )
        a_aa = (
            m_aa[0] + iw[0] * inv_dt2 + gyro[0],
            m_aa[1] + iw[1] * inv_dt2,
            m_aa[2] + iw[2] * inv_dt2,
            m_aa[3] + iw[3] * inv_dt2 + gyro[1],
            m_aa[4] + iw[4] * inv_dt2,
            m_aa[5] + iw[5] * inv_dt2 + gyro[2],
        )
        dl, da = solve66_cm(a_ll, tuple(m_la), a_aa, rhs_l, rhs_a)

        pos = tuple(pos[k] - relax * dl[k] * dynf for k in range(3))
        dq = cm.q_mul((da[0] * relax, da[1] * relax, da[2] * relax,
                       jnp.zeros_like(da[0])), quat)
        nq = _q_normalize(tuple(quat[k] - 0.5 * dq[k] for k in range(4)))
        quat = tuple(jnp.where(dyn, nq[k], quat[k]) for k in range(4))

        geom = rep.geometry_pose(
            cache, static, {"pos": pos, "quat": quat}, consts, gather_fix,
            paired_table(pos, quat),
        )
        rows2 = rep.eval_rows(
            geom, cache, consts, jnp.stack(rows["lam"]), pen,
            jnp.stack(rows["stick"]), alpha_cur, params,
        )
        lam2, pen2, stick2 = rep.dual_update(rows2, geom, pen, params.beta,
                                             params)
        if do_dual:
            lam = lam2
            if ramp:
                pen = pen2
            stick = stick2
        else:  # final post-stabilize sweep: no dual ascent (solver.cpp:411)
            lam = jnp.stack(rows2["lam"])
            stick = jnp.stack(rows2["stick"])

    return (jnp.stack(pos), jnp.stack(quat), lam, pen,
            jnp.asarray(stick).astype(jnp.float32), jnp.stack(geom["sep"]))


def _make_kernel_iterblock_grid(params: SolverParams, gb: int, spec):
    def kernel(*refs):
        pid = pl.program_id(0)
        own_iota = _block_iota(pid, gb)
        cache = _read_cache(refs[:12])
        (pos_b, quat_b, lam_r, pen_r, stick_r, mass_r, invm_r, fric_r,
         inertia_r, inv_inertia_r, ip_r, iq_r) = refs[12:24]
        pos_t_r, quat_t_r, invm_t_r, fric_t_r = refs[24:28]
        out_refs = refs[28:]

        body_const = {
            "mass": mass_r[:],
            "inv_mass": invm_r[:],
            "friction": fric_r[:],
            "inertia": tuple(inertia_r[k] for k in range(3)),
            "inv_inertia": tuple(inv_inertia_r[k] for k in range(3)),
        }
        outs = _iterblock_grid_math(
            params, spec, gb, pid, own_iota, cache,
            lam_r[:], pen_r[:], stick_r[:], body_const,
            tuple(ip_r[k] for k in range(3)),
            tuple(iq_r[k] for k in range(4)),
            tuple(pos_b[k] for k in range(3)),
            tuple(quat_b[k] for k in range(4)),
            tuple(pos_t_r[k] for k in range(3)),
            tuple(quat_t_r[k] for k in range(4)),
            invm_t_r[:], fric_t_r[:], rep.select_gather,
        )
        for ref, val in zip(out_refs, outs):
            ref[:] = val

    return kernel


def _iterblock_grid_call_math(params, gb, spec, contacts, b, pos, quat,
                              lam, pen, stickf, ip, iq):
    """Off-TPU twin of the multi-iteration gridded launch: the SAME
    per-block math (_iterblock_grid_math) with the same block decomposition
    — including the bounded cross-block pose lag (each block's table starts
    at launch-start values and only its own rows refresh mid-launch) — as
    plain jitted XLA with xla_gather, so the grid tier's semantics are
    CPU-testable without Mosaic."""
    d, g, _ = contacts.other.shape

    def blk(x, pid):
        g_ax = x.ndim - 2
        return lax.slice_in_dim(x, pid * gb, (pid + 1) * gb, axis=g_ax)

    outs = []
    for pid in range(g // gb):
        own_iota = _block_iota(pid, gb)
        cache = jax.tree_util.tree_map(lambda x: blk(x, pid), contacts)
        body_const = {
            "mass": blk(b.mass, pid),
            "inv_mass": blk(b.inv_mass, pid),
            "friction": blk(b.friction, pid),
            "inertia": tuple(blk(b.inertia, pid)[k] for k in range(3)),
            "inv_inertia": tuple(blk(b.inv_inertia, pid)[k] for k in range(3)),
        }
        outs.append(_iterblock_grid_math(
            params, spec, gb, pid, own_iota, cache,
            blk(lam, pid), blk(pen, pid), blk(stickf, pid), body_const,
            tuple(blk(ip, pid)[k] for k in range(3)),
            tuple(blk(iq, pid)[k] for k in range(4)),
            tuple(blk(pos, pid)[k] for k in range(3)),
            tuple(blk(quat, pid)[k] for k in range(4)),
            tuple(pos[k] for k in range(3)),
            tuple(quat[k] for k in range(4)),
            b.inv_mass, b.friction, rep.xla_gather,
        ))
    return tuple(
        jnp.concatenate([o[i] for o in outs], axis=outs[0][i].ndim - 2)
        for i in range(len(outs[0]))
    )


def _iterblock_grid_call(params, gb, spec, contacts, b, pos, quat, lam, pen,
                         stickf, ip, iq):
    if _interpret_mode():
        return _iterblock_grid_call_math(
            params, gb, spec, contacts, b, pos, quat, lam, pen, stickf, ip, iq
        )
    d, g, _ = contacts.other.shape
    cache_args = _cache_to_args(contacts)
    in_args = cache_args + [
        pos, quat, lam, pen, stickf, b.mass, b.inv_mass, b.friction,
        b.inertia, b.inv_inertia, ip, iq,
        pos, quat, b.inv_mass, b.friction,
    ]
    in_specs = (
        [_blk_spec(a.shape, gb) for a in cache_args]
        + [_blk_spec(a.shape, gb) for a in in_args[12:24]]
        + [_full_spec(pos.shape), _full_spec(quat.shape),
           _full_spec(b.inv_mass.shape), _full_spec(b.friction.shape)]
    )
    shp = jax.ShapeDtypeStruct
    out_shape = [
        shp((3, g, 128), jnp.float32),       # pos
        shp((4, g, 128), jnp.float32),       # quat
        shp(lam.shape, jnp.float32),
        shp(pen.shape, jnp.float32),
        shp(stickf.shape, jnp.float32),
        shp((4, d, g, 128), jnp.float32),    # final dual separations
    ]
    out_specs = [_blk_spec(s.shape, gb) for s in out_shape]
    return pl.pallas_call(
        _make_kernel_iterblock_grid(params, gb, spec),
        grid=(g // gb,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret_mode(),
    )(*in_args)


def _grid_specs(params: SolverParams, n_iters: int, k_cad: int,
                residency: int):
    """Static launch plan: the step's iterations chunked into launches of
    ``residency``, each iteration tagged (alpha, do_dual, rebuild, ramp).
    Hessian cadence ``k_cad`` is launch-local (every launch rebuilds at its
    first iteration — nothing is carried across launches); the penalty
    ramps at cadence-block tails and on the final main iteration, the
    augmented-Lagrangian cadence of the fused kernel."""
    total = n_iters + (1 if params.post_stabilize else 0)
    r = max(1, residency)
    launches = []
    for s in range(0, total, r):
        spec = []
        for j in range(min(r, total - s)):
            it = s + j
            if params.post_stabilize:
                alpha = 1.0 if it < n_iters else 0.0
            else:
                alpha = float(params.alpha)
            do_dual = it < n_iters
            rebuild = (j % k_cad) == 0
            last_in_launch = j + 1 >= min(r, total - s)
            nxt_rebuild = last_in_launch or (((j + 1) % k_cad) == 0)
            ramp = nxt_rebuild or (it == n_iters - 1)
            spec.append((alpha, do_dual, rebuild, ramp))
        launches.append(tuple(spec))
    return tuple(launches)


def step_grid(world: World, params: SolverParams, cap: Capacity) -> World:
    """Large-N step: gridded kernel A + multi-iteration-resident gridded
    solve launches (``Capacity.grid_residency`` iterations per launch),
    prediction/finalize reusing the portable XLA stages.  Contact-only
    (the dispatcher routes big jointed scenes to XLA)."""
    from .ops.broadphase import refresh_or_reuse
    from .solver import _sanitize, finalize, predict, stale_lhs_ok

    b = world.bodies
    g = b.g
    n = b.n
    gb = _pick_gb(g)

    bp = refresh_or_reuse(
        world.bp, b, world.exclusions, cap.max_degree, params.bp_margin,
        window=cap.bp_window,
    )
    world = world.replace(bp=bp)
    contacts, keptmask, once, man_dropped = collide_and_init_grid(
        world.contacts, bp.nb, bp.key, bp.thr, b, params
    )
    overflow = bp.cand - jnp.sum(keptmask).astype(jnp.int32)

    # Phase 3 (XLA, elementwise): reuse the portable prediction.
    linvel, angvel, inertial_pos, inertial_quat, pos_start, quat_start, sanitized = predict(b, params)
    pos0 = b.pos_n3
    quat0 = b.quat_n4

    def to_cg(a):  # (N, C) -> (C, G, 128)
        return jnp.moveaxis(a, 0, 1).reshape(a.shape[1], g, 128)

    ip = to_cg(inertial_pos)
    iq = to_cg(inertial_quat)
    ps = to_cg(pos_start)
    qs = to_cg(quat_start)

    d = world.contacts.other.shape[0]

    def run_iters(k_cad, n_iters=params.iterations):
        c = (ps, qs, contacts.lam, contacts.penalty,
             contacts.stick.astype(jnp.float32))
        sep = jnp.zeros((4, d, g, 128), jnp.float32)

        def do_launch(cc, spec):
            pos, quat, lam, pen, stickf, sep2 = _iterblock_grid_call(
                params, gb, spec, contacts, b, cc[0], cc[1], cc[2], cc[3],
                cc[4], ip, iq,
            )
            return (pos, quat, lam, pen, stickf), sep2

        # Runs of identical launch specs (the common case: every launch of
        # a non-post-stabilize step is the same) fold into ONE lax.scan, so
        # the step graph holds a single launch site per distinct spec —
        # Mosaic compiles each multi-iteration kernel once.
        specs = _grid_specs(params, n_iters, k_cad, cap.grid_residency)
        i = 0
        while i < len(specs):
            j = i
            while j < len(specs) and specs[j] == specs[i]:
                j += 1
            count = j - i
            if count > 1:
                def body(carry, _, spec=specs[i]):
                    cc, _sep = carry
                    return do_launch(cc, spec), None

                (c, sep), _ = lax.scan(body, (c, sep), None, length=count)
            else:
                c, sep = do_launch(c, specs[i])
            i = j
        return c + (sep,)

    # Impact iteration boost (config.impact_iterations) — same semantics
    # as step_pallas/_step_impl, with the grid tier's unrefined gate.
    boost = 0 < params.iterations < params.impact_iterations
    if boost:
        calm = stale_lhs_ok(
            b, bp,
            params.replace(lhs_stale_speed_max=min(
                params.impact_speed_min, params.lhs_stale_speed_max)),
            refine=False,
        )

    k_re = max(1, params.lhs_rebuild_every)
    if k_re > 1:
        k_fr = max(1, params.lhs_fresh_rebuild_every)
        stale_ok = stale_lhs_ok(b, bp, params, refine=False)
        if boost:
            # calm: scene cadence/iterations; energetic: boosted iterations
            # with cadence per the fresh gate (step_pallas semantics).
            nb_i = params.impact_iterations
            carry = lax.cond(
                calm,
                lambda _: run_iters(k_re),
                lambda _: lax.cond(
                    stale_ok,
                    lambda __: run_iters(k_re, nb_i),
                    lambda __: run_iters(k_fr, nb_i),
                    operand=None,
                ),
                operand=None,
            )
        elif k_re != k_fr:
            carry = lax.cond(
                stale_ok,
                lambda _: run_iters(k_re),
                lambda _: run_iters(k_fr),
                operand=None,
            )
        else:
            carry = run_iters(k_re)
    elif boost:
        carry = lax.cond(
            calm,
            lambda _: run_iters(1),
            lambda _: run_iters(1, params.impact_iterations),
            operand=None,
        )
    else:
        carry = run_iters(1)
    pos_cg, quat_cg, lam, pen, stickf, sep_slots = carry

    def to_n(a):  # (C, G, 128) -> (N, C)
        return jnp.moveaxis(a.reshape(a.shape[0], n), 0, 1)

    pos_f, sanitized = _sanitize(to_n(pos_cg), pos0, sanitized)
    quat_f, sanitized = _sanitize(to_n(quat_cg), quat0, sanitized)

    contacts = contacts.replace(lam=lam, penalty=pen, stick=stickf > 0.5)

    return finalize(
        world, b, contacts, world.joints, world.springs, pos_f, quat_f,
        pos0, quat0, linvel, angvel, lam, sep_slots, once, overflow,
        sanitized, params, degree_overflow=man_dropped,
    )
