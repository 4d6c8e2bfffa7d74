"""Checkpoint save/load: the whole simulation is one pytree.

The reference has no checkpointing (SURVEY.md par.5: scenes rebuild the world
from scratch).  Here the entire ``World`` — body state, warmstarted contact
cache, joint/spring duals, diagnostics — plus the static ``SolverParams`` /
``Capacity`` config round-trips through one ``.npz`` file, so a run can be
paused and resumed bit-exactly.
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from ..config import Capacity, SolverParams
from ..ops.broadphase import BroadphaseCache
from ..state import Bodies, Contacts, Diagnostics, Joints, Springs, World


def _dump_dc(prefix: str, obj, out: dict) -> None:
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if dataclasses.is_dataclass(v):
            _dump_dc(f"{prefix}{f.name}.", v, out)
        else:
            out[f"{prefix}{f.name}"] = np.asarray(v)


def _load_dc(cls, prefix: str, data) -> object:
    kw = {}
    for f in dataclasses.fields(cls):
        sub = {
            "bodies": Bodies, "contacts": Contacts, "joints": Joints,
            "springs": Springs, "diagnostics": Diagnostics,
            "bp": BroadphaseCache,
        }.get(f.name)
        if sub is not None:
            kw[f.name] = _load_dc(sub, f"{prefix}{f.name}.", data)
        else:
            arr = data[f"{prefix}{f.name}"]
            kw[f.name] = jnp.asarray(arr)
    return cls(**kw)


def save_checkpoint(path: str, world: World, params: SolverParams, cap: Capacity) -> None:
    data: dict = {}
    _dump_dc("world.", world, data)
    meta = {
        "params": dataclasses.asdict(params),
        "cap": dataclasses.asdict(cap),
        "version": 1,
    }
    np.savez_compressed(path, __meta__=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **data)


def load_checkpoint(path: str):
    """Returns (world, params, cap)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        data = {k: z[k] for k in z.files if k != "__meta__"}
    params_kw = dict(meta["params"])
    params_kw["gravity"] = tuple(params_kw["gravity"])
    params = SolverParams(**params_kw)
    cap = Capacity(**meta["cap"])
    world = _load_dc(World, "world.", data)
    return world, params, cap
