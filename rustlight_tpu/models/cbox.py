"""Procedural Cornell box matching the reference's bundled render
(data/rustlight/cbox.png: green wall left, red wall right, tall block left of
the short block, area light in the ceiling).

The reference loads cbox from external pbrt/mitsuba files that are not part of
the repository, so the canonical Cornell geometry (Cornell CS measurements) is
reconstructed here procedurally, x-mirrored to match the bundled image.
"""
from __future__ import annotations

import numpy as np

from ..bsdfs import diffuse, MaterialDesc
from ..scene import Scene, make_camera, look_at, make_quad, TriMesh

WHITE = (0.725, 0.71, 0.68)
GREEN = (0.14, 0.45, 0.091)
RED = (0.63, 0.065, 0.05)
LIGHT_LE = (18.4, 15.6, 8.0)

_X = 552.8  # mirror axis


def _mx(p):
    """Mirror x to match the reference image orientation."""
    return (_X - p[0], p[1], p[2])


def _block(quads, material):
    meshes = []
    for q in quads:
        meshes.append(make_quad(*[_mx(p) for p in q], material=material))
    return meshes


def cornell_box(width: int = 512, height: int = 512,
                mat_overrides: dict | None = None) -> Scene:
    """Build the Cornell box.

    mat_overrides maps region name ('white', 'left', 'right', 'blocks') to a
    MaterialDesc, enabling the phong/specular BASELINE variants.
    """
    sc = Scene()
    ov = mat_overrides or {}
    m_white = sc.add_material(ov.get("white", diffuse(WHITE)))
    m_green = sc.add_material(ov.get("left", diffuse(GREEN)))
    m_red = sc.add_material(ov.get("right", diffuse(RED)))
    m_blocks = sc.add_material(ov.get("blocks", ov.get("white", diffuse(WHITE))))

    # floor / ceiling / back wall (white)
    sc.add_mesh(make_quad((0, 0, 0), (0, 0, 559.2), (549.6, 0, 559.2), (552.8, 0, 0),
                          material=m_white, name="floor"))
    sc.add_mesh(make_quad((0, 548.8, 0), (556, 548.8, 0), (556, 548.8, 559.2),
                          (0, 548.8, 559.2), material=m_white, name="ceiling"))
    sc.add_mesh(make_quad((0, 0, 559.2), (0, 548.8, 559.2), (556, 548.8, 559.2),
                          (549.6, 0, 559.2), material=m_white, name="back"))
    # left wall green (x = 0), right wall red (x ~ 552.8)
    sc.add_mesh(make_quad((0, 0, 559.2), (0, 0, 0), (0, 548.8, 0), (0, 548.8, 559.2),
                          material=m_green, name="left"))
    sc.add_mesh(make_quad((552.8, 0, 0), (549.6, 0, 559.2), (556, 548.8, 559.2),
                          (556, 548.8, 0), material=m_red, name="right"))

    # wall extensions toward the camera (z in [-60, 0]): the classic data's
    # frustum at fov 39.3077 slightly exceeds the box mouth, leaving a black
    # border the reference's own cbox render doesn't have (its lost cbox.json
    # evidently extended the walls). The strips are coplanar continuations;
    # interior transport changes only by the tiny extra front-opening bounce.
    sc.add_mesh(make_quad((-20, 0, -60), (-20, 0, 0), (576, 0, 0),
                          (576, 0, -60), material=m_white, name="floor_ext"))
    sc.add_mesh(make_quad((-20, 548.8, -60), (576, 548.8, -60),
                          (576, 548.8, 0), (-20, 548.8, 0),
                          material=m_white, name="ceiling_ext"))
    sc.add_mesh(make_quad((0, -20, 0), (0, -20, -60), (0, 568.8, -60),
                          (0, 568.8, 0), material=m_green, name="left_ext"))
    sc.add_mesh(make_quad((552.8, -20, -60), (552.8, -20, 0),
                          (552.8, 568.8, 0), (552.8, 568.8, -60),
                          material=m_red, name="right_ext"))

    # area light just below the ceiling, normal facing down
    sc.add_mesh(make_quad((343, 548.79, 227), (343, 548.79, 332), (213, 548.79, 332),
                          (213, 548.79, 227), material=m_white, emission=LIGHT_LE,
                          name="light"))

    # short block (appears right after mirroring)
    short = [
        ((130, 165, 65), (82, 165, 225), (240, 165, 272), (290, 165, 114)),
        ((290, 0, 114), (290, 165, 114), (240, 165, 272), (240, 0, 272)),
        ((130, 0, 65), (130, 165, 65), (290, 165, 114), (290, 0, 114)),
        ((82, 0, 225), (82, 165, 225), (130, 165, 65), (130, 0, 65)),
        ((240, 0, 272), (240, 165, 272), (82, 165, 225), (82, 0, 225)),
    ]
    # tall block (appears left after mirroring)
    tall = [
        ((423, 330, 247), (265, 330, 296), (314, 330, 456), (472, 330, 406)),
        ((423, 0, 247), (423, 330, 247), (472, 330, 406), (472, 0, 406)),
        ((472, 0, 406), (472, 330, 406), (314, 330, 456), (314, 0, 456)),
        ((314, 0, 456), (314, 330, 456), (265, 330, 296), (265, 0, 296)),
        ((265, 0, 296), (265, 330, 296), (423, 330, 247), (423, 0, 247)),
    ]
    for q in short + tall:
        sc.add_mesh(make_quad(*[_mx(p) for p in q], material=m_blocks))

    sc.camera = make_camera(
        width, height, fov=39.3077,
        to_world=look_at((278, 273, -800), (278, 273, 0), (0, 1, 0)),
        fov_axis="x",
    )
    return sc
