"""Scene library (the reference's scenes.h presets + extensions)."""

from .scenes import SCENE_NAMES, SCENES, Scene, SceneBuilder, load_scene

__all__ = ["SCENES", "SCENE_NAMES", "Scene", "SceneBuilder", "load_scene"]
