"""Vectorized numeric solvers.

Reference: src/math.rs — `solve_quadratic` (:324-352), `solve_cubic`
(:236-305, trigonometric/Cardano), `newton_raphson_iterate` (:136-225).
All forms here are branch-free over whole wavefronts: every case (linear
degeneracy, single vs triple real roots) is computed and mask-selected.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_quadratic(a, b, c):
    """Roots of a x^2 + b x + c, numerically stable (citardauq for the small
    root). Returns (x0, x1, has_root); x0 <= x1. Linear inputs (a ~ 0) give
    the single root in both slots."""
    linear = jnp.abs(a) < 1e-20
    x_lin = -c / jnp.where(jnp.abs(b) > 1e-20, b, 1.0)
    disc = b * b - 4.0 * a * c
    has = linear | (disc >= 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = -0.5 * (b + jnp.where(b >= 0.0, sq, -sq))
    r1 = q / jnp.where(jnp.abs(a) > 1e-20, a, 1.0)
    r2 = c / jnp.where(jnp.abs(q) > 1e-20, q, 1.0)
    x0 = jnp.minimum(r1, r2)
    x1 = jnp.maximum(r1, r2)
    x0 = jnp.where(linear, x_lin, x0)
    x1 = jnp.where(linear, x_lin, x1)
    return x0, x1, has


def solve_cubic(a, b, c, d):
    """Real roots of a x^3 + b x^2 + c x + d (math.rs:236-305).

    Returns (roots [.., 3], count): `count` in {1, 3}; with count==1 the
    single root fills all three slots. Degenerate a ~ 0 falls back to the
    quadratic (count reported as 1 with both roots in slots 0/1)."""
    cubic = jnp.abs(a) >= 1e-20
    sa = jnp.where(cubic, a, 1.0)
    # depressed form t^3 + p t + q, x = t - b/(3a)
    p = (3.0 * sa * c - b * b) / (3.0 * sa * sa)
    q = (2.0 * b ** 3 - 9.0 * sa * b * c + 27.0 * sa * sa * d) / (27.0 * sa ** 3)
    shift = -b / (3.0 * sa)

    disc = (q * q) / 4.0 + (p ** 3) / 27.0
    three = disc < 0.0

    # three real roots: trigonometric method
    mp = jnp.sqrt(jnp.maximum(-p / 3.0, 1e-30))
    arg = jnp.clip(3.0 * q / (2.0 * p * mp), -1.0, 1.0)
    theta = jnp.arccos(jnp.where(three, arg, 0.0)) / 3.0
    two_pi3 = 2.0 * jnp.pi / 3.0
    t3 = jnp.stack([2.0 * mp * jnp.cos(theta - k * two_pi3)
                    for k in range(3)], -1)

    # one real root: Cardano
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-q / 2.0 + sq)
    v = jnp.cbrt(-q / 2.0 - sq)
    t1 = u + v

    roots = jnp.where(three[..., None], t3,
                      jnp.broadcast_to(t1[..., None], t3.shape)) \
        + shift[..., None]

    x0, x1, _ = solve_quadratic(b, c, d)
    quad = jnp.stack([x0, x1, x1], -1)
    roots = jnp.where(cubic[..., None], roots, quad)
    count = jnp.where(cubic & three, 3, 1)
    return roots, count


def newton_bisect(cdf_fn, pdf_fn, lo, hi, target, iters: int = 20):
    """Monotone-CDF inversion: fixed-iteration Newton with a bisection
    safeguard (the vectorized analogue of math.rs newton_raphson_iterate;
    also exposed from integrators/point_normal_poly)."""
    x = 0.5 * (lo + hi)

    def body(_, carry):
        x, lo, hi = carry
        f = cdf_fn(x) - target
        lo = jnp.where(f < 0, x, lo)
        hi = jnp.where(f > 0, x, hi)
        df = pdf_fn(x)
        x_new = x - f / jnp.where(jnp.abs(df) > 1e-10, df, 1.0)
        bad = (x_new <= lo) | (x_new >= hi) | (~jnp.isfinite(x_new)) \
            | (jnp.abs(df) <= 1e-10)
        return jnp.where(bad, 0.5 * (lo + hi), x_new), lo, hi

    x, _, _ = jax.lax.fori_loop(0, iters, body, (x, lo, hi))
    return x
