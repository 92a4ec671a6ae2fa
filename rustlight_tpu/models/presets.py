"""Small analytic test scenes used by the statistical test oracles."""
from __future__ import annotations

import numpy as np

from ..bsdfs import diffuse, MaterialDesc
from ..scene import Scene, make_camera, look_at, make_sphere, make_quad


def simple_sphere_scene(width=64, height=64, albedo=(0.5, 0.5, 0.5)) -> Scene:
    """Diffuse sphere on a ground plane under a constant environment."""
    sc = Scene()
    m = sc.add_material(diffuse(albedo))
    sc.add_mesh(make_sphere((0, 1, 0), 1.0, material=m))
    sc.add_mesh(make_quad((-20, 0, -20), (20, 0, -20), (20, 0, 20), (-20, 0, 20),
                          material=m))
    sc.env_constant = np.asarray([1.0, 1.0, 1.0], np.float32)
    sc.camera = make_camera(width, height, fov=60.0,
                            to_world=look_at((0, 1.5, -5), (0, 1, 0), (0, 1, 0)))
    return sc


def furnace_scene(width=32, height=32, albedo=0.5) -> Scene:
    """White furnace: a diffuse sphere inside a uniform unit-radiance envmap.

    Analytic answer for any point on the sphere: L = 1/(1 - albedo) toward the
    camera when multiple scattering converges; with a max_depth cutoff D the
    partial geometric sum sum_{k=0..D} albedo^k applies. The classic IS/pdf
    sanity oracle (SURVEY.md §4).
    """
    sc = Scene()
    m = sc.add_material(diffuse((albedo, albedo, albedo)))
    sc.add_mesh(make_sphere((0, 0, 0), 1.0, material=m, n_theta=64, n_phi=64))
    sc.env_constant = np.asarray([1.0, 1.0, 1.0], np.float32)
    sc.camera = make_camera(width, height, fov=40.0,
                            to_world=look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)))
    return sc
