"""Stratified sampling over the sample-pass axis.

Reference: src/samplers/stratified.rs — pre-shuffled stratified 1D and 2D
tables for the first `nb_dim` dimensions (the CLI builds nb_dim = 4,
examples/cli.rs:891-894), spp rounded up to a power of 4, uniform beyond the
table. The wavefront version stratifies the same leading dimensions over the
spp passes WITHOUT tables: pass s of pixel p lands in stratum
perm_{p,dim}(s) of Z_n4 (1D) or a sqrt(n4) x sqrt(n4) grid (2D), where
perm_{p,dim} is a per-(pixel, dimension) pseudorandom permutation (an affine
map s -> a*s + b mod n4 with odd a — bijective on Z_{4^k}, so each pixel
sees every stratum of every stratified dimension exactly once across its
passes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# reference CLI: StratifiedSampler::create(nb_samples, 4)
NB_DIM = 4


def _round_up_pow4(n: int) -> int:
    v = 1
    while v < n:
        v *= 4
    return v


def _stratum(key, pixel_ids, pass_idx, dim, n4: int, table: int):
    """perm_{pixel,dim}(pass_idx) in Z_n4. `dim` may be a traced int.
    `table` tags the 1D (7919) vs 2D (7920) permutation family — the
    reference shuffles its 1D and 2D tables independently
    (stratified.rs:22-42), so 1D dim k and 2D dim k must not share a
    permutation (sharing would cover only diagonal stratum pairs in any
    integrand coupling those dimensions)."""
    kd = jax.random.fold_in(jax.random.fold_in(key, table), dim)
    b = jax.random.randint(jax.random.fold_in(kd, 1), pixel_ids.shape, 0, n4)
    a = (2 * jax.random.randint(jax.random.fold_in(kd, 2), pixel_ids.shape,
                                0, n4 // 2) + 1)
    return jnp.remainder(a * pass_idx + b + pixel_ids, n4)


def stratified_1d(key, pixel_ids, pass_idx, spp: int, dim, u):
    """Stratify a fresh uniform u [n] into the lane's pass stratum."""
    n4 = _round_up_pow4(max(spp, 1))
    s = _stratum(key, pixel_ids, pass_idx, dim, n4, 7919)
    return (s.astype(jnp.float32) + u) / n4


def stratified_2d(key, pixel_ids, pass_idx, spp: int, dim, u):
    """Stratify fresh uniforms u [n, 2] on a sqrt(n4) x sqrt(n4) grid."""
    n4 = _round_up_pow4(max(spp, 1))
    side = int(n4 ** 0.5)
    s = _stratum(key, pixel_ids, pass_idx, dim, n4, 7920)
    sx = jnp.remainder(s, side)
    sy = s // side
    return (jnp.stack([sx, sy], -1).astype(jnp.float32) + u) / side


def stratified_jitter(key, pixel_ids, pass_idx, spp: int):
    """Stratified 2D pixel jitter (2D dimension 0)."""
    u = jax.random.uniform(jax.random.fold_in(key, pass_idx),
                           pixel_ids.shape + (2,))
    return stratified_2d(key, pixel_ids, pass_idx, spp, 0, u)
