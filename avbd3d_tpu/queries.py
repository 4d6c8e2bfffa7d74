"""Spatial queries: OBB raycast picking.

TPU-native rebuild of ``Solver::pick`` (solver.cpp:145-228): the reference
walks the body list doing a slab test in each dynamic body's local frame and
returns the closest hit plus the body-local hit point (the hook intended for
mouse dragging, declared-but-unwired in the reference GUI — main.cpp:43).
Here the slab test is vectorized over all bodies and the winner selected by
argmin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .maths import quat_conj, quat_rotate

_EPS = 1.0e-6
_BIG = 3.0e38


@jax.jit
def pick(bodies, origin, direction):
    """Ray-cast against all dynamic OBBs.

    Returns (body_index, t_hit, local_point): ``body_index`` is -1 on miss;
    ``local_point`` is in the hit body's local frame (solver.cpp:218-227).
    """
    origin = jnp.asarray(origin, jnp.float32)
    direction = jnp.asarray(direction, jnp.float32)
    dir_sq = jnp.sum(direction * direction)
    ray_dir = direction / jnp.sqrt(jnp.where(dir_sq < _EPS, 1.0, dir_sq))

    pos = bodies.pos_n3
    quat = bodies.quat_n4
    half = bodies._n3(bodies.size) * 0.5
    inv_q = quat_conj(quat)
    local_o = quat_rotate(inv_q, origin[None, :] - pos)
    local_d = quat_rotate(inv_q, jnp.broadcast_to(ray_dir, pos.shape))

    # Slab test per axis (solver.cpp:175-204).
    parallel = jnp.abs(local_d) < _EPS
    inside = jnp.abs(local_o) <= half
    safe_d = jnp.where(parallel, 1.0, local_d)
    t0 = (-half - local_o) / safe_d
    t1 = (half - local_o) / safe_d
    t_lo = jnp.minimum(t0, t1)
    t_hi = jnp.maximum(t0, t1)
    t_lo = jnp.where(parallel, -_BIG, t_lo)
    t_hi = jnp.where(parallel, _BIG, t_hi)

    t_enter = jnp.maximum(jnp.max(t_lo, axis=-1), 0.0)
    t_exit = jnp.min(t_hi, axis=-1)
    ok_parallel = jnp.all(~parallel | inside, axis=-1)
    hit = (t_enter <= t_exit) & ok_parallel & bodies.dynamic.reshape(bodies.n)
    t_hit = jnp.where(t_enter >= 0.0, t_enter, t_exit)
    hit = hit & (t_hit >= 0.0) & (dir_sq >= _EPS)

    score = jnp.where(hit, t_hit, _BIG)
    best = jnp.argmin(score)
    found = score[best] < _BIG
    body_index = jnp.where(found, best, -1)
    local_point = local_o[best] + local_d[best] * t_hit[best]
    return body_index, jnp.where(found, t_hit[best], -1.0), local_point
