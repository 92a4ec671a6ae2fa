"""Single-scattering distance-sampling integrator (Kulla-style equiangular
and extensions) — the `point-normal` integrator family.

Reference: src/integrators/explicit/point_normal.rs. Implemented strategies
(vectorized, branch-free):
  TR          — spectral transmittance distance sampling (volume.rs:95-135)
  EQUIANGULAR — Kulla & Conty equiangular sampling around the sampled light
                point (point_normal.rs:15-176)
  EQ_CLAMP    — equiangular with the angular domain clamped by the emitter
                normal's visibility half-space (point_normal.rs:54-133)
Strategies combine with the balance heuristic over their distance pdfs
(the reference's strategy-MIS, point_normal.rs:1560-2208). The Taylor-series
product sampling (point_normal_poly.rs) and Bezier warps are round-2 work.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..accel import intersect_rays, visible
from ..scene import fill_hit, generate_rays, sample_light
from ..scene.volume import phase_eval, transmittance, distance_pdf
from ..utils.rng import stream_next, stream_next2d
from .common import Integrator

_PI = jnp.pi

STRATEGY_TR = "tr"
STRATEGY_EQUIANGULAR = "equiangular"
STRATEGY_EQ_CLAMP = "eq_clamp"


def _equiangular_params(o, d, pos, tmax):
    """Per-lane equiangular parametrization: (delta, d_l, theta_a, theta_b)."""
    delta = jnp.sum(d * (pos - o), axis=-1)
    closest = o + d * delta[:, None]
    d_l = jnp.maximum(jnp.linalg.norm(pos - closest, axis=-1), 1e-6)
    theta_a = jnp.arctan(-delta / d_l)
    theta_b = jnp.arctan((tmax - delta) / d_l)
    return delta, d_l, theta_a, theta_b


def _equiangular_clamp(o, d, pos, nrm, tmax, theta_a, theta_b, delta, d_l):
    """Clamp the angular range by the light's normal half-space
    (point_normal.rs:54-133). Returns (theta_a, theta_b, valid)."""
    d_dot_n = jnp.sum(d * nrm, axis=-1)
    p_dot_n = jnp.sum((pos - o) * nrm, axis=-1)
    invisible = (d_dot_n <= 0.0) & (p_dot_n >= 0.0)
    parallel = (jnp.abs(d_dot_n) < 1e-5) | ((p_dot_n == 0.0) & (d_dot_n > 0.0))

    t_hit = p_dot_n / jnp.where(jnp.abs(d_dot_n) > 1e-12, d_dot_n, 1.0)
    hit_inside = (t_hit >= 0.0) & (t_hit <= tmax)
    alpha = jnp.arctan((t_hit - delta) / d_l)
    ta = jnp.where(parallel | (~hit_inside), theta_a,
                   jnp.where(p_dot_n > 0.0, alpha, theta_a))
    tb = jnp.where(parallel | (~hit_inside), theta_b,
                   jnp.where(p_dot_n > 0.0, theta_b, alpha))
    valid = (~invisible) & (ta < tb)
    return ta, tb, valid


def _equiangular_sample(u, delta, d_l, theta_a, theta_b, tmax):
    t = d_l * jnp.tan((1.0 - u) * theta_a + u * theta_b)
    t_eq = jnp.clip(t + delta, 0.0, tmax)
    denom = (theta_b - theta_a) * (d_l ** 2 + t ** 2)
    pdf = jnp.where(denom > 0.0, d_l / jnp.maximum(denom, 1e-30), 0.0)
    return t_eq, pdf


def _equiangular_pdf(dist, delta, d_l, theta_a, theta_b, clamped):
    t = dist - delta
    theta = jnp.arctan(t / d_l)
    inside = (~clamped) | ((theta >= theta_a) & (theta <= theta_b))
    pdf = d_l / jnp.maximum((theta_b - theta_a) * (d_l ** 2 + t ** 2), 1e-30)
    return jnp.where(inside, pdf, 0.0)


class IntegratorPointNormal(Integrator):
    def __init__(self, strategies: Sequence[str] = (STRATEGY_EQUIANGULAR,),
                 splitting: Optional[float] = None):
        for s in strategies:
            assert s in (STRATEGY_TR, STRATEGY_EQUIANGULAR, STRATEGY_EQ_CLAMP)
        self.strategies = tuple(strategies)
        self.splitting = splitting

    def _distance_pdfs(self, scene, name, t, o, d, ls, tmax, eq, eqc):
        """pdf of strategy `name` for distance t (for MIS)."""
        if name == STRATEGY_TR:
            return distance_pdf(scene.volume, t, jnp.zeros_like(t, bool))
        if name == STRATEGY_EQUIANGULAR:
            delta, d_l, ta, tb = eq
            return _equiangular_pdf(t, delta, d_l, ta, tb,
                                    jnp.zeros_like(t, bool))
        delta, d_l, ta, tb, valid = eqc
        p = _equiangular_pdf(t, delta, d_l, ta, tb, jnp.ones_like(t, bool))
        return jnp.where(valid, p, 0.0)

    def compute_pixel(self, scene, pix, stream):
        assert scene.volume is not None, "point_normal needs a medium"
        vol = scene.volume
        n = pix.shape[0]
        u_pix, stream = stream_next2d(stream, (n,))
        o, d = generate_rays(scene.camera, pix.astype(jnp.float32) + u_pix)
        rh = intersect_rays(scene.geom, o, d)
        tmax = jnp.where(rh.hit, rh.t, 1e7)

        # one light sample shared by all strategies (as the reference does for
        # its per-strategy evaluations)
        u_sel, stream = stream_next(stream, (n,))
        u_lpos, stream = stream_next2d(stream, (n,))

        li = jnp.zeros((n, 3), jnp.float32)
        n_strats = len(self.strategies)

        for name in self.strategies:
            u_t, stream = stream_next(stream, (n,))
            # sample the light from the ray origin (reference samples the
            # emitter position first, then the distance toward it)
            ls0 = sample_light(scene.emitters, scene.geom, o, u_sel, u_lpos)
            eq = _equiangular_params(o, d, ls0.p, tmax)
            delta, d_l, ta, tb = eq
            ta_c, tb_c, valid_c = _equiangular_clamp(
                o, d, ls0.p, ls0.n, tmax, ta, tb, delta, d_l)
            eqc = (delta, d_l, ta_c, tb_c, valid_c)

            if name == STRATEGY_TR:
                from ..scene.volume import volume_sample_distance
                sd = volume_sample_distance(vol, tmax, u_t)
                t = sd.t
                pdf_t = sd.pdf
                strat_valid = ~sd.exited
            elif name == STRATEGY_EQUIANGULAR:
                t, pdf_t = _equiangular_sample(u_t, delta, d_l, ta, tb, tmax)
                strat_valid = pdf_t > 0.0
            else:
                t, pdf_t = _equiangular_sample(u_t, delta, d_l, ta_c, tb_c, tmax)
                strat_valid = valid_c & (pdf_t > 0.0)

            x_t = o + d * t[:, None]
            # re-evaluate the light sample from the scatter point
            ls = sample_light(scene.emitters, scene.geom, x_t, u_sel, u_lpos)
            tr_cam = transmittance(vol, t)
            tr_light = transmittance(vol, ls.dist)
            ph = phase_eval(vol.phase_g, -d, ls.d)
            vis = visible(scene.geom, x_t, ls.p)

            # balance-heuristic MIS over distance strategies
            pdf_sum = jnp.zeros_like(pdf_t)
            for other in self.strategies:
                pdf_sum = pdf_sum + self._distance_pdfs(
                    scene, other, t, o, d, ls, tmax, eq, eqc)
            w = jnp.where(pdf_t > 0.0,
                          pdf_t / jnp.maximum(pdf_sum, 1e-30), 0.0)

            contrib = (vol.sigma_s[None, :] * tr_cam * tr_light
                       * ls.weight * (ph / jnp.maximum(pdf_t, 1e-30) * w)[:, None])
            ok = strat_valid & ls.valid & vis & (t > 0.0) & (t < tmax)
            li = li + jnp.where(ok[:, None], contrib, 0.0)

        return li
