"""Veach MIS test scene (four glossy plates x four light sizes).

The canonical multiple-importance-sampling validation setup from Veach's
thesis: a row of area lights of increasing size but equal power above a
stack of plates of increasing glossiness. BSDF sampling alone is good for
small lights + rough plates; light sampling alone for large lights + sharp
plates; only MIS handles the whole grid. The reference has no built-in copy
(its scenes live out-of-repo), but its `-s all|bsdf|emitter` path strategies
(path.rs:50-66) are exactly what this scene stresses.
"""
from __future__ import annotations

import numpy as np

from ..bsdfs import diffuse, phong
from ..scene import Scene, make_camera, look_at, make_quad


def veach_mis(width: int = 256, height: int = 192) -> Scene:
    sc = Scene()
    m_floor = sc.add_material(diffuse((0.4, 0.4, 0.4)))
    m_back = sc.add_material(diffuse((0.1, 0.1, 0.1)))
    m_light = sc.add_material(diffuse((0.0, 0.0, 0.0)))

    # floor + back wall
    sc.add_mesh(make_quad((-12, -2, -6), (12, -2, -6), (12, -2, 14),
                          (-12, -2, 14), material=m_floor, name="floor"))
    sc.add_mesh(make_quad((-12, -2, 14), (12, -2, 14), (12, 12, 14),
                          (-12, 12, 14), material=m_back, name="back"))

    # four glossy plates, exponent 40 -> 5000 (bottom = roughest); each is
    # oriented so the mirror direction from the light row reaches the camera
    # (normal = half vector of light dir and eye dir at the plate center)
    eye = np.asarray([0.0, 4.5, -12.0])
    light_c = np.asarray([0.0, 8.0, 8.0])
    exps = [5000.0, 1000.0, 200.0, 40.0]
    for i, ex in enumerate(exps):
        m = sc.add_material(phong(kd=(0.04,) * 3, ks=(0.6, 0.6, 0.6),
                                  exponent=ex, weight_specular=0.9))
        c = np.asarray([0.0, 0.0 + 1.5 * i, 7.0 - 2.2 * i])
        wl = light_c - c
        wl /= np.linalg.norm(wl)
        we = eye - c
        we /= np.linalg.norm(we)
        nrm = wl + we
        nrm /= np.linalg.norm(nrm)
        tang = np.cross(np.asarray([1.0, 0.0, 0.0]), nrm)  # depth direction
        tang /= np.linalg.norm(tang)
        half_w, half_d = 9.0, 0.55
        p00 = c - np.asarray([half_w, 0, 0]) - tang * half_d
        p10 = c + np.asarray([half_w, 0, 0]) - tang * half_d
        p11 = c + np.asarray([half_w, 0, 0]) + tang * half_d
        p01 = c - np.asarray([half_w, 0, 0]) + tang * half_d
        sc.add_mesh(make_quad(tuple(p00), tuple(p10), tuple(p11), tuple(p01),
                              material=m, name=f"plate{i}"))

    # four sphere-ish lights (small quads): radius doubles, power equal
    # Le scales as 1/area so every light carries the same flux
    sizes = [0.15, 0.4, 1.0, 2.2]
    power = 6.0
    xs = [-7.5, -2.5, 2.5, 7.5]
    for x, s in zip(xs, sizes):
        le = power / (s * s)
        sc.add_mesh(make_quad((x - s / 2, 8, 8 - s / 2), (x + s / 2, 8, 8 - s / 2),
                              (x + s / 2, 8, 8 + s / 2), (x - s / 2, 8, 8 + s / 2),
                              material=m_light, emission=(le, le, le),
                              name=f"light_{s}"))

    sc.camera = make_camera(width, height, fov=48.0,
                            to_world=look_at((0, 4.5, -12), (0, 2.5, 4),
                                             (0, 1, 0)))
    return sc
