"""Stratified sampling over the sample-pass axis.

Reference: src/samplers/stratified.rs — pre-shuffled stratified tables for the
first dimensions, spp rounded to a power of 4, uniform beyond the table. The
wavefront version stratifies the first 2D dimension (pixel jitter) over the
spp passes: pass s of pixel p lands in stratum perm_p(s) of a sqrt(spp) x
sqrt(spp) grid, where perm_p is a per-pixel pseudorandom permutation (an LCG
over Z_spp keyed by the pixel hash — bijective, so each pixel sees every
stratum exactly once).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _round_up_pow4(n: int) -> int:
    v = 1
    while v < n:
        v *= 4
    return v


def stratified_jitter(key, pixel_ids, pass_idx, spp: int):
    """Stratified 2D jitter in [0,1)^2 for each lane.

    pixel_ids [n] int32, pass_idx scalar, spp total passes (static).
    """
    n4 = _round_up_pow4(max(spp, 1))
    side = int(n4 ** 0.5)
    # per-pixel permutation of strata: s -> (a*s + b_p) mod n4 with odd a
    b = jax.random.randint(jax.random.fold_in(key, 1), pixel_ids.shape, 0, n4)
    a = 2 * jax.random.randint(jax.random.fold_in(key, 2), pixel_ids.shape, 0, n4 // 2) + 1
    stratum = jnp.remainder(a * pass_idx + b + pixel_ids, n4)
    sx = jnp.remainder(stratum, side)
    sy = stratum // side
    u = jax.random.uniform(jax.random.fold_in(key, pass_idx),
                           pixel_ids.shape + (2,))
    return (jnp.stack([sx, sy], -1).astype(jnp.float32) + u) / side
