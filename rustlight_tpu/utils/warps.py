"""Sampling warps: [0,1)^2 -> disk / hemisphere / sphere / triangle.

Vectorized, branch-free equivalents of the reference warps
(src/math.rs:37-73, 388-395). All take u [..., 2] and return points/directions
with matching batch shape.
"""
from __future__ import annotations

import jax.numpy as jnp

INV_PI = 1.0 / jnp.pi
FRAC_PI_4 = jnp.pi / 4.0
FRAC_PI_2 = jnp.pi / 2.0


def concentric_sample_disk(u):
    """PBRT concentric disk warp; u [..., 2] -> [..., 2]."""
    uo = 2.0 * u - 1.0
    ux, uy = uo[..., 0], uo[..., 1]
    use_x = jnp.abs(ux) > jnp.abs(uy)
    r = jnp.where(use_x, ux, uy)
    # Guard the 0/0 at the origin; the result is masked out below.
    safe_ux = jnp.where(ux == 0.0, 1.0, ux)
    safe_uy = jnp.where(uy == 0.0, 1.0, uy)
    theta = jnp.where(
        use_x, FRAC_PI_4 * (uy / safe_ux), FRAC_PI_2 - FRAC_PI_4 * (ux / safe_uy)
    )
    degenerate = (ux == 0.0) & (uy == 0.0)
    p = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1) * r[..., None]
    return jnp.where(degenerate[..., None], 0.0, p)


def cosine_sample_hemisphere(u):
    """Cosine-weighted hemisphere about +z; pdf = cos(theta)/pi."""
    d = concentric_sample_disk(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def cosine_hemisphere_pdf(wz):
    return jnp.maximum(wz, 0.0) * INV_PI


def sample_uniform_sphere(u):
    """Uniform direction on the sphere; pdf = 1/(4 pi)."""
    z = 1.0 - 2.0 * u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


UNIFORM_SPHERE_PDF = 1.0 / (4.0 * jnp.pi)


def sample_uniform_hemisphere(u):
    """Uniform direction on the +z hemisphere; pdf = 1/(2 pi)."""
    z = u[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


UNIFORM_HEMISPHERE_PDF = 1.0 / (2.0 * jnp.pi)


def uniform_sample_triangle(u):
    """Barycentric (b1, b2) uniform over a triangle (reference src/math.rs:388-395)."""
    su0 = jnp.sqrt(u[..., 0])
    return jnp.stack([1.0 - su0, u[..., 1] * su0], axis=-1)


def to_spherical_coordinates(d):
    """Direction -> (theta, phi) with phi in [0, 2pi) (reference src/emitter.rs:320-338)."""
    theta = jnp.arccos(jnp.clip(d[..., 2], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    return theta, phi


def from_spherical_coordinates(theta, phi):
    st, ct = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)
