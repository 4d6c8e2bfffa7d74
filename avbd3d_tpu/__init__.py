"""avbd3d_tpu — a TPU-native AVBD 3D rigid-body physics engine.

Ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference C++
engine (alxspiker/avbd-demo3d): SAT box-box collision, persistent 4-point
contact manifolds with warmstarting, an augmented-Lagrangian (AVBD) iterative
solver with per-body 6x6 block solves, weld joints, distance springs,
collision filtering, raycast picking, preset scenes, and a headless CLI with
per-step diagnostics.

The whole simulation advances through one pure jit-compiled function:

    from avbd3d_tpu import load_scene, step
    scene = load_scene("Stress1000")
    world = step(scene.world, scene.params, scene.cap)
"""

from .config import Capacity, SolverParams, default_params
from .models.scenes import SCENE_NAMES, SCENES, Scene, SceneBuilder, load_scene
from .queries import pick
from .solver import run_steps, step
from .state import Bodies, Contacts, Diagnostics, Joints, Springs, World

__all__ = [
    "Bodies",
    "Capacity",
    "Contacts",
    "Diagnostics",
    "Joints",
    "SCENES",
    "SCENE_NAMES",
    "Scene",
    "SceneBuilder",
    "SolverParams",
    "Springs",
    "World",
    "default_params",
    "load_scene",
    "pick",
    "run_steps",
    "step",
]

__version__ = "0.1.0"
