"""Primary-sample-space mutations (Kelemen-style).

Reference: MutatorKelemen (src/samplers/mcmc.rs:11-68) — exponential-scale
perturbation dv = s2 * exp(r * log(s1/s2)) applied with random sign and
wrap-around on [0,1). Vectorized over [chains, dims]; the reference's lazy
timestamp machinery disappears because all chains mutate all dims in lockstep.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class KelemenParams(NamedTuple):
    s1: float = 1.0 / 1024.0
    s2: float = 1.0 / 64.0


def kelemen_mutate(v, r, params: KelemenParams = KelemenParams()):
    """v, r same shape in [0,1). Returns mutated values in [0,1)."""
    log_ratio = -jnp.log(params.s2 / params.s1)
    add = r < 0.5
    r2 = jnp.where(add, r * 2.0, 2.0 * (r - 0.5))
    dv = params.s2 * jnp.exp(r2 * log_ratio)
    vp = jnp.where(add, v + dv, v - dv)
    vp = jnp.where(vp >= 1.0, vp - 1.0, vp)
    vp = jnp.where(vp < 0.0, vp + 1.0, vp)
    return jnp.where(vp >= 1.0, 0.0, vp)
