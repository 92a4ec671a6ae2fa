"""Scene loader registry.

Reference: SceneLoaderManager (src/scene_loader.rs:18-58) — an extension ->
loader registry (pbrt + xml registered there; obj added here as a
convenience, matching the library's OBJ support in geometry.rs:13-97).
"""
from __future__ import annotations

from pathlib import Path

from ..scene import Scene


def _load_obj_scene(path) -> Scene:
    import numpy as np
    from ..camera import make_camera, look_at
    from ..geometry import scene_bounds
    from .obj import load_obj

    scene = Scene()
    meshes, mats, _tex = load_obj(path)
    base = len(scene.materials)
    for m in mats:
        scene.add_material(m)
    for mesh in meshes:
        mesh.material += base
        scene.add_mesh(mesh)
    # default camera framing the bounds
    _, _, center, radius = scene_bounds(scene.meshes)
    eye = center + np.asarray([0, 0, -3.0 * radius])
    scene.camera = make_camera(512, 512, fov=45.0,
                               to_world=look_at(eye, center, (0, 1, 0)))
    return scene


LOADERS = {
    ".pbrt": lambda p: __import__(
        "rustlight_tpu.scene.loaders.pbrt", fromlist=["load_pbrt"]).load_pbrt(p),
    ".xml": lambda p: __import__(
        "rustlight_tpu.scene.loaders.mitsuba", fromlist=["load_mitsuba"]).load_mitsuba(p),
    ".obj": _load_obj_scene,
}


def load_scene(path) -> Scene:
    """Load a scene file by extension (SceneLoaderManager::load)."""
    ext = Path(path).suffix.lower()
    if ext not in LOADERS:
        raise ValueError(f"no scene loader registered for '{ext}' "
                         f"(available: {sorted(LOADERS)})")
    return LOADERS[ext](path)


def register_loader(ext: str, fn) -> None:
    LOADERS[ext.lower()] = fn
