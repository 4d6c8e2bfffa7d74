"""ONE world body-sharded across a device mesh (shard_map + collectives).

`parallel.batched` scales by running many independent worlds; this module
scales a SINGLE large world past one chip: every (…, G, 128) leaf of the
World pytree is split along the group axis over the mesh's ``world`` axis,
and each device advances only its own body rows.

How the physics decomposes (design, not translation — the reference is
single-threaded C++ with no distribution story, README.md:158-162):

- **Partner reads ride all-gathers.**  The solver core reads partner state
  exclusively through the injected ``gather(table, idx)`` seam.  The
  sharded gather all-gathers the (G_loc, 128) table along ICI to the
  global (G, 128) layout, then indexes it — body tables are tiny compared
  to contact state (7 pose components × N × 4 B ≈ 450 KB at N = 16,384),
  so pose exchange is latency-, not bandwidth-, bound.  XLA CSEs the
  repeated all-gathers of the same operand within an iteration.
- **Broadphase is already the right decomposition.**  The row-blocked
  candidate selection (ops/broadphase.py ``row_block``) computes a block
  of rows against all N columns; under shard_map each device's block is
  its own rows and the column side is the all-gathered position table.
- **Step-level gates all-reduce.**  Broadphase cache reuse and the
  stale-Hessian speed gate fold their predicates over psum/pmax, so every
  shard takes the same lax.cond branch deterministically.
- **Contact state needs NO exchange.**  The replicated body-major cache
  stores each pair at both endpoints, and both replicas compute
  bit-identical row updates from the same gathered operands — exactly the
  property that removes scatter on one chip removes cross-chip writes
  here.  A pair spanning two shards is solved independently on each, and
  the two solutions agree by construction.

Single-chip backends are unaffected: with the default LocalComm every
collective is the identity and ``solver._step_impl`` is byte-identical to
the portable path (see tests/test_sharded_world.py for the equivalence
proof on a virtual 8-device CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..comm import MeshComm
from ..config import Capacity, SolverParams
from ..ops import replicated as rep
from ..solver import _step_impl
from ..state import World

try:  # jax >= 0.6 exports shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

AXIS = "world"


def _leaf_spec(x, g_global: int) -> P:
    """Shard every (…, G, 128) leaf along its group axis; replicate scalars."""
    shp = getattr(x, "shape", ())
    if len(shp) >= 2 and shp[-1] == 128 and shp[-2] == g_global:
        return P(*(None,) * (len(shp) - 2), AXIS, None)
    return P()


def world_specs(world: World) -> World:
    """PartitionSpec pytree matching ``world`` (group axis over AXIS)."""
    g = world.bodies.g
    return jax.tree_util.tree_map(lambda x: _leaf_spec(x, g), world)


def shard_world(world: World, mesh: Mesh) -> World:
    """Place a host world onto the mesh with the group axis split."""
    specs = world_specs(world)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), world, specs
    )


def _freeze_fallen(world: World, params: SolverParams) -> World:
    # Local (per-row) fall-freeze — same semantics as solver.step's
    # pre-pass (config.fall_freeze_y).
    b = world.bodies
    frozen = b.dynamic & (b.pos[1] < params.fall_freeze_y)
    return world.replace(bodies=b.replace(
        linvel=jnp.where(frozen[None], 0.0, b.linvel),
        angvel=jnp.where(frozen[None], 0.0, b.angvel),
        inv_mass=jnp.where(frozen, 0.0, b.inv_mass),
    ))


def _shard_body(world: World, params: SolverParams, cap: Capacity,
                n_shards: int, n_steps: int) -> World:
    comm = MeshComm(AXIS, n_shards)

    def one(w):
        if params.fall_freeze_y > -1.0e8:
            w = _freeze_fallen(w, params)

        def gather(table, idx):
            return rep.xla_gather(comm.all_gather_g(table), idx)

        return _step_impl(w, params, cap, gather, comm=comm)

    if n_steps == 1:
        return one(world)
    world, _ = jax.lax.scan(lambda w, _: (one(w), None), world, None,
                            length=n_steps)
    return world


@functools.partial(
    jax.jit, static_argnames=("params", "cap", "mesh", "n_steps")
)
def sharded_run(world: World, params: SolverParams, cap: Capacity,
                mesh: Mesh, n_steps: int = 1) -> World:
    """Advance a body-sharded world ``n_steps`` (scan inside shard_map).

    ``world`` must already be placed with ``shard_world(world, mesh)``
    (shardings then propagate; a host-resident world also works — jit
    honors the in_specs).  Joint/spring scenes are supported; the
    ballistic fast path is single-chip-only and simply not applied here.
    """
    specs = world_specs(world)
    n_shards = mesh.shape[AXIS]
    if world.bodies.g % n_shards:
        raise ValueError(
            f"group count {world.bodies.g} not divisible by mesh axis "
            f"'{AXIS}' size {n_shards}"
        )
    fn = shard_map(
        functools.partial(
            _shard_body, params=params, cap=cap, n_shards=n_shards,
            n_steps=n_steps,
        ),
        mesh=mesh,
        in_specs=(specs,),
        out_specs=specs,
        check_vma=False,
    )
    return fn(world)


def sharded_step(world: World, params: SolverParams, cap: Capacity,
                 mesh: Mesh) -> World:
    """One sharded step (see sharded_run)."""
    return sharded_run(world, params, cap, mesh, n_steps=1)


def make_world_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(devices, (AXIS,))
