"""Ambient occlusion integrator (reference src/integrators/ao.rs:4-71)."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..accel import intersect_rays, occluded_rays
from .. import EPSILON
from ..scene import fill_hit, generate_rays
from ..scene.scene import offset_ray_origin
from ..utils.frame import to_world
from ..utils.rng import stream_next, stream_next2d
from ..utils.warps import cosine_sample_hemisphere
from .common import Integrator


class IntegratorAO(Integrator):
    def __init__(self, max_distance: Optional[float] = None,
                 normal_correction: bool = False):
        self.max_distance = max_distance
        self.normal_correction = normal_correction

    def compute_pixel(self, scene, pix, stream):
        n = pix.shape[0]
        u_pix, stream = stream_next2d(stream, (n,))
        o, d = generate_rays(scene.camera, pix.astype(jnp.float32) + u_pix)
        rh = intersect_rays(scene.geom, o, d)
        hit = fill_hit(scene, o, d, rh)

        cos_theta = hit.wi[..., 2]
        if self.normal_correction:
            flip = cos_theta <= 0.0
            alive = hit.valid
        else:
            flip = jnp.zeros(n, bool)
            alive = hit.valid & (cos_theta > 0.0)

        u, stream = stream_next2d(stream, (n,))
        d_local = cosine_sample_hemisphere(u)
        d_local = jnp.where(flip[:, None], -d_local, d_local)
        d_world = to_world(hit.frame, d_local)

        tnear = jnp.full(n, EPSILON, jnp.float32)
        if self.max_distance is None:
            tfar = jnp.full(n, jnp.inf, jnp.float32)
        else:
            tfar = jnp.full(n, self.max_distance, jnp.float32)
        o_ao = offset_ray_origin(hit.p, hit.n_g, d_world)
        occ = occluded_rays(scene.geom, o_ao, d_world, tnear, tfar)
        visible = alive & (~occ)
        return jnp.where(visible[:, None], 1.0, 0.0) * jnp.ones((n, 3), jnp.float32)
