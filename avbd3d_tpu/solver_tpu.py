"""Pallas TPU backend: the AVBD step as two mega-kernels.

On this TPU stack, XLA scalar gathers run at ~7ns/element and every kernel
launch costs tens of microseconds — a step graph with ~100 gathers and ~700
kernels is overhead-bound regardless of FLOPs.  This backend runs the same
replicated body-major core (ops/replicated.py) inside two Mosaic kernels:

  Kernel A  narrowphase + cross-step match + warmstart init (phase 2)
  Kernel B  the full iterative solve (phase 4): all iterations execute
            inside one kernel with state resident in VMEM; the only
            cross-body communication (neighbor pose fetch) uses the
            G-way broadcast-select gather (rep.select_gather), which lowers
            to lane-local take_along_axis — no XLA gather anywhere.

Broadphase (top_k), prediction, velocity update and diagnostics remain in
XLA (gather-free, cheap).  Restrictions: N <= 1024 bodies (G <= 8) and no
joints/springs (scenes using them fall back to the XLA backend — see
solver.step dispatch).
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
from .state import Contacts, World

# Cache leaves in kernel order (bool leaves carried as float32 in-kernel).
_CACHE_FIELDS = (
    "other", "count", "feature", "r_a", "r_b", "normal",
    "stick", "c0_n", "c0_t1", "c0_t2", "lam", "penalty",
)
_BODY_FIELDS = ("pos", "quat", "half", "inv_mass", "friction")


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


def _body_args(tables):
    out = []
    for f in _BODY_FIELDS:
        v = tables[f]
        out.extend(v) if isinstance(v, tuple) else out.append(v)
    return out


def _read_body(refs):
    it = iter(refs)
    return {
        "pos": tuple(next(it)[:] for _ in range(3)),
        "quat": tuple(next(it)[:] for _ in range(4)),
        "half": tuple(next(it)[:] for _ in range(3)),
        "inv_mass": next(it)[:],
        "friction": next(it)[:],
    }


def _world_inertia_comps(quat, diag):
    """(G,128)-component world inertia: I_w[i][j] = sum_k d_k ax_k[i] ax_k[j]."""
    axes = cm.q_axes(quat)
    comps = []
    for i, j in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)):
        comps.append(sum(diag[k] * axes[k][i] * axes[k][j] for k in range(3)))
    return comps


# ---------------------------------------------------------------------------
# Kernel A: narrowphase + match + init
# ---------------------------------------------------------------------------

def _make_kernel_a(params: SolverParams):
    def kernel(*refs):
        n_in = len(_CACHE_FIELDS) + 1 + 12
        in_refs = refs[:n_in]
        out_refs = refs[n_in:]
        old_args = [r[:] for r in in_refs[: len(_CACHE_FIELDS)]]
        old = _args_to_cache(old_args)
        neighbors = in_refs[len(_CACHE_FIELDS)][:]
        body = _read_body(in_refs[len(_CACHE_FIELDS) + 1:])

        new = rep.collide_and_init(old, neighbors, body, params, rep.select_gather)
        for ref, val in zip(out_refs, _cache_to_args(new)):
            ref[:] = val

    return kernel


@functools.partial(jax.jit, static_argnames=("params",))
def collide_and_init_tpu(old: Contacts, neighbors, tables, params: SolverParams) -> Contacts:
    in_args = _cache_to_args(old) + [neighbors] + _body_args(tables)
    out_shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in _cache_to_args(old)]
    outs = pl.pallas_call(
        _make_kernel_a(params),
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(in_args),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shapes),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*in_args)
    return _args_to_cache(outs)


# ---------------------------------------------------------------------------
# Kernel B: the iterative solve
# ---------------------------------------------------------------------------

def _make_kernel_b(params: SolverParams, d: int, g: int):
    dt = params.dt
    inv_dt2 = 1.0 / (dt * dt)
    total_iters = params.iterations + (1 if params.post_stabilize else 0)
    relax = params.relaxation

    def kernel(*refs):
        # Inputs: cache(12) | body(13: pos3 quat4 half3 invm fric) |
        #         start pose(7) | inertial pose(7) | mass | dynf |
        #         inertia(3) | inv_inertia(3)
        (other_r, count_r, feature_r, r_a_r, r_b_r, normal_r, stick_r,
         c0n_r, c0t1_r, c0t2_r, lam_r, pen_r) = refs[:12]
        body = _read_body(refs[12:24])
        it25 = refs[24:]
        start_pos = tuple(it25[k][:] for k in range(3))
        start_quat = tuple(it25[3 + k][:] for k in range(4))
        inertial_pos = tuple(it25[7 + k][:] for k in range(3))
        inertial_quat = tuple(it25[10 + k][:] for k in range(4))
        mass = it25[14][:]
        dynf = it25[15][:]
        inertia = tuple(it25[16 + k][:] for k in range(3))
        inv_inertia = tuple(it25[19 + k][:] for k in range(3))
        (pos_o0, pos_o1, pos_o2, quat_o0, quat_o1, quat_o2, quat_o3,
         lam_o, pen_o, stick_o, sep_o) = refs[-11:]

        cache = Contacts(
            other=other_r[:], count=count_r[:], feature=feature_r[:],
            r_a=r_a_r[:], r_b=r_b_r[:], normal=normal_r[:],
            stick=stick_r[:] > 0.5, c0_n=c0n_r[:], c0_t1=c0t1_r[:],
            c0_t2=c0t2_r[:], lam=lam_r[:], penalty=pen_r[:],
        )
        consts = rep.pair_constants(cache.other, body, rep.select_gather)

        def geom_at(pos, quat):
            return rep.eval_geometry(
                cache, {"pos": pos, "quat": quat}, consts, rep.select_gather
            )

        def one_iteration(it, carry):
            px, py, pz, q0, q1, q2, q3, lam, pen, stick_f = carry
            pos = (px, py, pz)
            quat = (q0, q1, q2, q3)
            stick = stick_f > 0.5
            if params.post_stabilize:
                alpha_cur = jnp.where(it < params.iterations, 1.0, 0.0)
            else:
                alpha_cur = jnp.float32(params.alpha)

            geom = geom_at(pos, quat)
            rows = rep.eval_rows(geom, cache, consts, lam, pen, stick, alpha_cur, params)
            f = rep.primal_force(rows, pen)

            iw = _world_inertia_comps(quat, inertia)
            iiw = _world_inertia_comps(quat, inv_inertia)
            sys = rep.body_system(geom, f, pen, iiw)

            # rhs = M (x - x~)/dt^2 (+ I_w rot_err/dt^2) + constraint forces
            rhs_l = tuple(
                mass * (pos[k] - inertial_pos[k]) * inv_dt2 + sys["F"][k]
                for k in range(3)
            )
            q_err = cm.q_mul(quat, (-inertial_quat[0], -inertial_quat[1],
                                    -inertial_quat[2], inertial_quat[3]))
            sgn = jnp.where(q_err[3] < 0.0, -2.0, 2.0)
            rot = (q_err[0] * sgn, q_err[1] * sgn, q_err[2] * sgn)
            rhs_a = tuple(
                (iw[0] * rot[0] + iw[1] * rot[1] + iw[2] * rot[2]) * inv_dt2 + sys["T"][0]
                if k == 0 else
                (iw[1] * rot[0] + iw[3] * rot[1] + iw[4] * rot[2]) * inv_dt2 + sys["T"][1]
                if k == 1 else
                (iw[2] * rot[0] + iw[4] * rot[1] + iw[5] * rot[2]) * inv_dt2 + sys["T"][2]
                for k in range(3)
            )

            m_dt2 = mass * inv_dt2
            a_ll = (
                sys["m_ll"][0] + m_dt2, sys["m_ll"][1], sys["m_ll"][2],
                sys["m_ll"][3] + m_dt2, sys["m_ll"][4], sys["m_ll"][5] + m_dt2,
            )
            a_aa = (
                sys["m_aa"][0] + iw[0] * inv_dt2 + sys["gyro"][0],
                sys["m_aa"][1] + iw[1] * inv_dt2,
                sys["m_aa"][2] + iw[2] * inv_dt2,
                sys["m_aa"][3] + iw[3] * inv_dt2 + sys["gyro"][1],
                sys["m_aa"][4] + iw[4] * inv_dt2,
                sys["m_aa"][5] + iw[5] * inv_dt2 + sys["gyro"][2],
            )
            dl, da = solve66_cm(a_ll, tuple(sys["m_la"]), a_aa, rhs_l, rhs_a)

            new_pos = tuple(pos[k] - relax * dl[k] * dynf for k in range(3))
            dq = cm.q_mul((da[0] * relax, da[1] * relax, da[2] * relax,
                           jnp.zeros_like(da[0])), quat)
            nq = tuple(quat[k] - 0.5 * dq[k] for k in range(4))
            msq = nq[0] ** 2 + nq[1] ** 2 + nq[2] ** 2 + nq[3] ** 2
            bad = msq < 1e-6
            inv = jnp.where(bad, 0.0, 1.0 / jnp.sqrt(jnp.where(bad, 1.0, msq)))
            nq = tuple(
                jnp.where(dynf > 0.0,
                          jnp.where(bad, jnp.float32(k == 3), nq[k] * inv),
                          quat[k])
                for k in range(4)
            )

            geom2 = geom_at(new_pos, nq)
            rows2 = rep.eval_rows(
                geom2, cache, consts, jnp.stack(rows["lam"]), pen,
                jnp.stack(rows["stick"]), alpha_cur, params,
            )
            lam2, pen2, stick2 = rep.dual_update(rows2, geom2, pen, params.beta, params)
            do_dual = it < params.iterations
            lam = jnp.where(do_dual, lam2, jnp.stack(rows2["lam"]))
            pen = jnp.where(do_dual, pen2, pen)
            stick = cm.bwhere(do_dual, stick2, jnp.stack(rows2["stick"]))
            return (new_pos[0], new_pos[1], new_pos[2], nq[0], nq[1], nq[2],
                    nq[3], lam, pen, stick.astype(jnp.float32))

        carry = (
            start_pos[0], start_pos[1], start_pos[2],
            start_quat[0], start_quat[1], start_quat[2], start_quat[3],
            cache.lam, cache.penalty, cache.stick.astype(jnp.float32),
        )
        carry = lax.fori_loop(0, total_iters, one_iteration, carry)
        px, py, pz, q0, q1, q2, q3, lam, pen, stick_f = carry

        geom_f = geom_at((px, py, pz), (q0, q1, q2, q3))
        sep_o[:] = jnp.stack(geom_f["sep"])
        pos_o0[:] = px
        pos_o1[:] = py
        pos_o2[:] = pz
        quat_o0[:] = q0
        quat_o1[:] = q1
        quat_o2[:] = q2
        quat_o3[:] = q3
        lam_o[:] = lam
        pen_o[:] = pen
        stick_o[:] = stick_f

    return kernel


@functools.partial(jax.jit, static_argnames=("params",))
def solve_loop_tpu(contacts: Contacts, tables, start_pos, start_quat,
                   inertial_pos, inertial_quat, mass_g, dynf_g,
                   inertia_g, inv_inertia_g, params: SolverParams):
    """Run the phase-4 loop in one kernel.  All body inputs are (G, 128)
    component tuples.  Returns (pos comps, quat comps, lam, pen, stick)."""
    d, g, _ = contacts.other.shape
    in_args = (
        _cache_to_args(contacts)
        + _body_args(tables)
        + list(start_pos) + list(start_quat)
        + list(inertial_pos) + list(inertial_quat)
        + [mass_g, dynf_g]
        + list(inertia_g) + list(inv_inertia_g)
    )
    shp = jax.ShapeDtypeStruct
    out_shape = (
        [shp((g, 128), jnp.float32)] * 7
        + [shp((12, d, g, 128), jnp.float32)] * 2
        + [shp((4, d, g, 128), jnp.float32)] * 2
    )
    outs = pl.pallas_call(
        _make_kernel_b(params, d, g),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(in_args),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shape),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*in_args)
    pos = tuple(outs[:3])
    quat = tuple(outs[3:7])
    lam, pen = outs[7], outs[8]
    stick = outs[9] > 0.5
    sep = outs[10]
    return pos, quat, lam, pen, stick, sep


# ---------------------------------------------------------------------------
# Full step
# ---------------------------------------------------------------------------

def step_pallas(world: World, params: SolverParams, cap: Capacity) -> World:
    """Phases 1/3/5/6 in XLA (gather-free), phases 2/4 as mega-kernels."""
    from .ops.broadphase import neighbor_lists
    from .solver import body_tables, finalize, predict, _sanitize

    b = world.bodies
    n = b.n
    g = n // 128
    tables = body_tables(b)

    # Phase 1: broadphase
    neighbors, overflow = neighbor_lists(b.pos, b.radius, world.exclusions, cap.max_degree)

    # Phase 2: kernel A
    contacts = collide_and_init_tpu(world.contacts, neighbors, tables, params)

    # Phase 3: prediction
    linvel, angvel, inertial_pos, inertial_quat, pos_start, quat_start, sanitized = predict(b, params)

    def comps(x, k):
        return tuple(x[:, i].reshape(g, 128) for i in range(k))

    dynf_g = b.dynamic.astype(jnp.float32).reshape(g, 128)
    pos_c, quat_c, lam, pen, stick, sep_slots = solve_loop_tpu(
        contacts, tables,
        comps(pos_start, 3), comps(quat_start, 4),
        comps(inertial_pos, 3), comps(inertial_quat, 4),
        b.mass.reshape(g, 128), dynf_g,
        comps(b.inertia, 3), comps(b.inv_inertia, 3),
        params,
    )
    pos_f = jnp.stack([c.reshape(n) for c in pos_c], axis=-1)
    quat_f = jnp.stack([c.reshape(n) for c in quat_c], axis=-1)
    pos_f, sanitized = _sanitize(pos_f, b.pos, sanitized)
    quat_f, sanitized = _sanitize(quat_f, b.quat, sanitized)

    contacts = contacts.replace(lam=lam, penalty=pen, stick=stick)

    return finalize(
        world, b, contacts, world.joints, world.springs, pos_f, quat_f,
        b.pos, b.quat, linvel, angvel, lam, sep_slots, overflow, sanitized,
        params,
    )
