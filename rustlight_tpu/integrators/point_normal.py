"""Single-scattering distance-sampling integrator (Kulla-style equiangular
and extensions) — the `point-normal` integrator family.

Reference: src/integrators/explicit/point_normal.rs. Implemented strategies
(vectorized, branch-free):
  TR          — spectral transmittance distance sampling (volume.rs:95-135)
  EQUIANGULAR — Kulla & Conty equiangular sampling around the sampled light
                point (point_normal.rs:15-176)
  EQ_CLAMP    — equiangular with the angular domain clamped by the emitter
                normal's visibility half-space (point_normal.rs:54-133)
  WARP        — linear/Bezier warps of the equiangular angular domain shaped
                by transmittance (T), phase (P) and/or point-normal cosine (N)
                products, chained via MultipleWrap (point_normal.rs:188-385)
  PN          — analytic a·cos+b·sin point-normal factor sampling on the
                normal-clamped angular domain (point_normal.rs:653-758, pn_ex)
  TAYLOR_TR / TAYLOR_PHASE — degree-6 Taylor product sampling of the
                transmittance / HG factor with Newton CDF inversion
                (point_normal_poly.rs + point_normal.rs:401-512;
                eq_tr_taylor_ex / eq_phase_taylor_ex)
  PN_TAYLOR_TR / PN_TAYLOR_PHASE — Taylor×point-normal product via the
                closed-form cdf_pn (point_normal.rs:757-940;
                pn_tr_taylor_ex / pn_phase_taylor_ex)
  BEST / PN_BEST — "best sampling technique": the phase-Taylor draw composed
                with a transmittance-shaped Bezier warp (HybridSampling,
                point_normal.rs:520-649 + 1365-1391; warped PN-Taylor,
                :1482-1547 — the g==0 TR-poly special case there is an
                experiment we fold into the same composition)
Strategies combine with the balance heuristic over their distance pdfs
(the reference's strategy-MIS, point_normal.rs:1560-2208). Lanes where a
product sampler's setup is degenerate fall back to plain equiangular
(sample AND pdf, keeping the MIS weights consistent) instead of the
reference's Option::None early-out.
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
STRATEGY_WARP = "warp"
STRATEGY_PN = "pn"
STRATEGY_TAYLOR_TR = "taylor_tr"
STRATEGY_TAYLOR_PHASE = "taylor_phase"
STRATEGY_PN_TAYLOR_TR = "pn_taylor_tr"
STRATEGY_PN_TAYLOR_PHASE = "pn_taylor_phase"

STRATEGY_BEST = "best"          # HybridSampling: phase-Taylor x TR-Bezier
STRATEGY_PN_BEST = "pn_best"    # PointNormalTaylor(phase) x TR-Bezier

_ALL_STRATEGIES = (STRATEGY_TR, STRATEGY_EQUIANGULAR, STRATEGY_EQ_CLAMP,
                   STRATEGY_WARP, STRATEGY_PN, STRATEGY_TAYLOR_TR,
                   STRATEGY_TAYLOR_PHASE, STRATEGY_PN_TAYLOR_TR,
                   STRATEGY_PN_TAYLOR_PHASE, STRATEGY_BEST, STRATEGY_PN_BEST)
_TAYLOR = (STRATEGY_TAYLOR_TR, STRATEGY_TAYLOR_PHASE)
_PN_TAYLOR = (STRATEGY_PN_TAYLOR_TR, STRATEGY_PN_TAYLOR_PHASE)
_BEST = (STRATEGY_BEST, STRATEGY_PN_BEST)


# ----------------------------- angular warps (point_normal.rs:188-345)

def _linear_pdf(v0, v1, x):
    return 2.0 * (v0 * (1.0 - x) + v1 * x) / jnp.maximum(v0 + v1, 1e-30)


def _linear_cdf(v0, v1, x):
    return x * (v0 * (2.0 - x) + v1 * x) / jnp.maximum(v0 + v1, 1e-30)


def _linear_cdf_inv(v0, v1, s):
    # solve (v1-v0) x^2 + 2 v0 x - (v0+v1) s = 0 on [0,1]
    a = v1 - v0
    b = 2.0 * v0
    c = -(v0 + v1) * s
    disc = jnp.sqrt(jnp.maximum(b * b - 4.0 * a * c, 0.0))
    lin = jnp.abs(a) < 1e-8 * jnp.maximum(jnp.abs(v0) + jnp.abs(v1), 1e-20)
    q = -0.5 * (b + jnp.where(b >= 0, disc, -disc))
    r1 = q / jnp.where(jnp.abs(a) > 1e-30, a, 1.0)
    r2 = c / jnp.where(jnp.abs(q) > 1e-30, q, 1.0)
    in01 = lambda r: (r >= -1e-4) & (r <= 1.0 + 1e-4)
    root = jnp.where(in01(r1), r1, r2)
    root = jnp.where(lin, s, root)
    return jnp.clip(root, 0.0, 1.0)


def _bezier_pdf(v0, v1, v2, x):
    tot = v0 + v1 + v2
    c = (1 - x) ** 2 * v0 + 2 * (1 - x) * x * v1 + x ** 2 * v2
    return jnp.where(tot > 1e-5, 3.0 * c / jnp.maximum(tot, 1e-30), 1.0)


def _bezier_cdf(v0, v1, v2, x):
    tot = v0 + v1 + v2
    c = ((v0 - 2 * v1 + v2) * x ** 3 + 3 * (v1 - v0) * x ** 2 + 3 * v0 * x)
    return jnp.where(tot > 1e-5, c / jnp.maximum(tot, 1e-30), x)


def _bezier_cdf_inv(v0, v1, v2, s, iters: int = 24):
    """Monotone-CDF inversion by safeguarded Newton (the reference uses a
    closed-form cubic solver; Newton vectorizes better and the cdf is
    monotone because the pdf is nonnegative)."""
    lo = jnp.zeros_like(s)
    hi = jnp.ones_like(s)
    x = s

    def body(_, carry):
        x, lo, hi = carry
        f = _bezier_cdf(v0, v1, v2, x) - s
        lo = jnp.where(f < 0, x, lo)
        hi = jnp.where(f > 0, x, hi)
        df = _bezier_pdf(v0, v1, v2, x)
        x_new = x - f / jnp.maximum(df, 1e-8)
        bad = (x_new <= lo) | (x_new >= hi) | (~jnp.isfinite(x_new))
        x_new = jnp.where(bad, 0.5 * (lo + hi), x_new)
        return x_new, lo, hi

    x, _, _ = jax.lax.fori_loop(0, iters, body, (x, lo, hi))
    return jnp.clip(x, 0.0, 1.0)


def _warp_values(kind, theta, o, d, p_light, n_light, delta, d_l, sigma_t_avg, g):
    """Warp shaping values at angle theta (point_normal.rs:1260-1276)."""
    if kind == "P":
        tmp = 1.0 + g * g + 2.0 * g * jnp.sin(theta)
        return 1.0 / (tmp * jnp.sqrt(jnp.maximum(tmp, 1e-12)))
    if kind == "N":
        dd = (o + d * delta[:, None] - p_light) / jnp.maximum(d_l, 1e-20)[:, None]
        a = jnp.sum(n_light * dd, -1)
        b = jnp.sum(n_light * d, -1)
        return jnp.maximum(a * jnp.cos(theta) + b * jnp.sin(theta), 0.0)
    if kind == "T":
        ct = jnp.cos(theta)
        return jnp.exp(-sigma_t_avg * (
            d_l * jnp.tan(theta) + delta
            + d_l / jnp.maximum(jnp.abs(ct), 1e-6)))
    raise ValueError(kind)


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
                 splitting: Optional[float] = None,
                 warps: str = "T", warps_strategy: str = "linear",
                 use_aa: bool = True, connection: str = "ex"):
        for s in strategies:
            assert s in _ALL_STRATEGIES, s
        assert connection in ("ex", "phase")
        self.strategies = tuple(strategies)
        self.splitting = splitting
        self.warps = warps          # chars from {T, P, N} (point_normal.rs -w)
        self.warps_strategy = warps_strategy  # linear | bezier
        self.use_aa = use_aa        # -z disable_aa: pixel centers, no jitter
        # EX = explicit light connection; PHASE = sample the phase function
        # and intersect the emitter (Strategies::{EX,PHASE} contribution
        # branches, point_normal.rs:2373-2470)
        self.connection = connection

    # -------------------------- warp chains (MultipleWrap, rs:327-385)
    def _warp_params(self, scene, o, d, ls0, eq):
        delta, d_l, ta, tb = eq
        g = scene.volume.phase_g
        st = jnp.mean(scene.volume.sigma_t)
        mid = 0.5 * (ta + tb)
        params = []
        for c in self.warps:
            args = (o, d, ls0.p, ls0.n, delta, d_l, st, g)
            v0 = _warp_values(c, ta, *args)
            v1 = _warp_values(c, tb, *args)
            if self.warps_strategy == "bezier":
                vm = _warp_values(c, mid, *args)
                params.append((v0, vm, v1))
            else:
                params.append((v0, v1))
        return params

    def _warp_chain_sample(self, params, s):
        """pos = cdf_inv chained; pdf = product (point_normal.rs:331-345)."""
        pdf = jnp.ones_like(s)
        pos = s
        for pr in params:
            if len(pr) == 2:
                pos = _linear_cdf_inv(pr[0], pr[1], pos)
                pdf = pdf * _linear_pdf(pr[0], pr[1], pos)
            else:
                pos = _bezier_cdf_inv(pr[0], pr[1], pr[2], pos)
                pdf = pdf * _bezier_pdf(pr[0], pr[1], pr[2], pos)
        return pos, pdf

    def _warp_chain_pdf(self, params, x):
        """Reverse chain pdf at angular position x (rs:364-380)."""
        pdf = jnp.ones_like(x)
        pos = x
        for pr in reversed(params):
            if len(pr) == 2:
                pdf = pdf * _linear_pdf(pr[0], pr[1], pos)
                pos = _linear_cdf(pr[0], pr[1], pos)
            else:
                pdf = pdf * _bezier_pdf(pr[0], pr[1], pr[2], pos)
                pos = _bezier_cdf(pr[0], pr[1], pr[2], pos)
        return pdf

    def _product_setups(self, scene, o, d, ls0, eq, eqc):
        """Per-lane setup products for the analytic/Taylor product samplers
        (poly coefficients, mixture probabilities, normalizations)."""
        from . import point_normal_poly as pp
        delta, d_l, _, _ = eq
        _, _, ta_c, tb_c, valid_c = eqc
        st_avg = jnp.mean(scene.volume.sigma_t)
        g = scene.volume.phase_g
        setups = {}
        need_pn = any(s in self.strategies
                      for s in (STRATEGY_PN, STRATEGY_PN_BEST) + _PN_TAYLOR)
        if need_pn:
            a0, b0 = pp.pn_coeffs(o, d, ls0.p, ls0.n, delta, d_l)
            nrm = pp.pn_norm(a0, b0, ta_c, tb_c)
            ok = valid_c & (nrm > 1e-20)
            safe = jnp.where(jnp.abs(nrm) > 1e-20, nrm, 1.0)
            setups["_pn_raw"] = (a0, b0)
            setups[STRATEGY_PN] = (a0 / safe, b0 / safe, ok)
        for name in self.strategies:
            if name in _TAYLOR + _PN_TAYLOR + _BEST:
                if name.endswith("_tr"):
                    c = pp.poly6_tr(d_l, st_avg)
                    clamp = pp.clamp_angle_tr(st_avg, d_l)
                else:
                    c = pp.poly6_phase(g)
                    clamp = jnp.broadcast_to(pp.clamp_angle_phase(g),
                                             d_l.shape)
                if name in _TAYLOR + (STRATEGY_BEST,):
                    _, _, ta, tb = eq
                    st = pp.taylor_setup(c, ta, tb, clamp)
                else:
                    a0, b0 = setups["_pn_raw"]
                    st = pp.pn_taylor_setup(c, a0, b0, ta_c, tb_c, clamp)
                    st["valid"] = st["valid"] & valid_c
                if name in _BEST:
                    # HybridSampling / warped PN-Taylor (point_normal.rs:
                    # 520-649, 1365-1391, 1482-1547): the Taylor draw is
                    # composed with a Bezier warp shaped by transmittance
                    dom_a, dom_b = ((ta_c, tb_c) if name == STRATEGY_PN_BEST
                                    else eq[2:])
                    mid = 0.5 * (dom_a + dom_b)
                    args = (o, d, ls0.p, ls0.n, delta, d_l, st_avg, g)
                    wp = (_warp_values("T", dom_a, *args),
                          _warp_values("T", mid, *args),
                          _warp_values("T", dom_b, *args))
                    setups[name] = (c, st, wp)
                else:
                    setups[name] = (c, st)
        return setups

    @staticmethod
    def _best_compose_sample(theta1, pdf_ang, wp, dom_a, dom_b):
        """Warp composition of HybridSampling::sample (point_normal.rs:
        622-640): theta2 = warp^-1 of the normalized Taylor draw, density
        multiplied by the warp pdf (range factors cancel)."""
        rng = jnp.maximum(dom_b - dom_a, 1e-12)
        x1 = jnp.clip((theta1 - dom_a) / rng, 0.0, 1.0)
        x2 = _bezier_cdf_inv(*wp, x1)
        theta2 = dom_a + x2 * rng
        return theta2, pdf_ang * _bezier_pdf(*wp, x2)

    @staticmethod
    def _best_compose_pdf(theta2, wp, dom_a, dom_b):
        """Inverse mapping for MIS: theta2 -> theta1 and the warp pdf."""
        rng = jnp.maximum(dom_b - dom_a, 1e-12)
        x2 = jnp.clip((theta2 - dom_a) / rng, 0.0, 1.0)
        x1 = _bezier_cdf(*wp, x2)
        return dom_a + x1 * rng, _bezier_pdf(*wp, x2)

    def _distance_pdfs(self, scene, name, t, o, d, ls, tmax, eq, eqc,
                       wparams, setups):
        """pdf of strategy `name` for distance t (for MIS)."""
        from . import point_normal_poly as pp
        delta, d_l, ta, tb = eq
        if name == STRATEGY_TR:
            return distance_pdf(scene.volume, t, jnp.zeros_like(t, bool))
        if name == STRATEGY_EQUIANGULAR:
            return _equiangular_pdf(t, delta, d_l, ta, tb,
                                    jnp.zeros_like(t, bool))
        if name == STRATEGY_WARP:
            tt = t - delta
            theta = jnp.arctan(tt / d_l)
            x = jnp.clip((theta - ta) / jnp.maximum(tb - ta, 1e-12), 0.0, 1.0)
            pdf_ang = self._warp_chain_pdf(wparams, x) / jnp.maximum(tb - ta, 1e-12)
            return pdf_ang * d_l / jnp.maximum(d_l ** 2 + tt ** 2, 1e-30)
        eq_fallback = _equiangular_pdf(t, delta, d_l, ta, tb,
                                       jnp.zeros_like(t, bool))
        tt = t - delta
        theta = jnp.arctan(tt / d_l)
        jac = d_l / jnp.maximum(d_l ** 2 + tt ** 2, 1e-30)
        if name in _TAYLOR:
            c, st = setups[name]
            return jnp.where(st["valid"], pp.taylor_pdf(c, st, theta) * jac,
                             eq_fallback)
        if name in _PN_TAYLOR:
            c, st = setups[name]
            return jnp.where(st["valid"],
                             pp.pn_taylor_pdf(c, st, theta) * jac,
                             eq_fallback)
        if name in _BEST:
            c, st, wp = setups[name]
            _, _, ta_c, tb_c, _ = eqc
            dom_a, dom_b = ((ta_c, tb_c) if name == STRATEGY_PN_BEST
                            else (ta, tb))
            theta1, pdf_w = self._best_compose_pdf(theta, wp, dom_a, dom_b)
            base = (pp.pn_taylor_pdf(c, st, theta1)
                    if name == STRATEGY_PN_BEST
                    else pp.taylor_pdf(c, st, theta1))
            return jnp.where(st["valid"], base * pdf_w * jac, eq_fallback)
        if name == STRATEGY_PN:
            a_n, b_n, ok = setups[STRATEGY_PN]
            _, _, ta_c, tb_c, _ = eqc
            inside = (theta >= ta_c) & (theta <= tb_c)
            p = jnp.abs(a_n * jnp.cos(theta) + b_n * jnp.sin(theta)) * jac
            return jnp.where(ok, jnp.where(inside, p, 0.0), eq_fallback)
        delta, d_l, ta_c, tb_c, valid = eqc
        p = _equiangular_pdf(t, delta, d_l, ta_c, tb_c, jnp.ones_like(t, bool))
        return jnp.where(valid, p, 0.0)

    # ------------------------ splitting traversal (-k, point_normal.rs:2455)
    def _sample_distance_single(self, scene, name, u_t, o, d, p_l, n_l, tmax):
        """Distance sample targeting one split light's position (the
        reference's create_distance_sampling per selected light)."""
        from . import point_normal_poly as pp
        delta, d_l, ta, tb = _equiangular_params(o, d, p_l, tmax)
        if name == STRATEGY_TR:
            from ..scene.volume import volume_sample_distance
            sd = volume_sample_distance(scene.volume, tmax, u_t)
            return sd.t, sd.pdf, ~sd.exited
        if name in _TAYLOR:
            st_avg = jnp.mean(scene.volume.sigma_t)
            if name == STRATEGY_TAYLOR_TR:
                c = pp.poly6_tr(d_l, st_avg)
                clamp = pp.clamp_angle_tr(st_avg, d_l)
            else:
                g = scene.volume.phase_g
                c = pp.poly6_phase(g)
                clamp = jnp.broadcast_to(pp.clamp_angle_phase(g), d_l.shape)
            st = pp.taylor_setup(c, ta, tb, clamp)
            theta, pdf_ang = pp.taylor_sample(c, st, u_t)
            tt = d_l * jnp.tan(theta)
            t = jnp.clip(tt + delta, 0.0, tmax)
            pdf = pdf_ang * d_l / jnp.maximum(d_l ** 2 + tt ** 2, 1e-30)
            t_eq, pdf_eq = _equiangular_sample(u_t, delta, d_l, ta, tb, tmax)
            t = jnp.where(st["valid"], t, t_eq)
            pdf = jnp.where(st["valid"], pdf, pdf_eq)
            return t, pdf, pdf > 0.0
        if name == STRATEGY_EQ_CLAMP:
            ta_c, tb_c, ok = _equiangular_clamp(o, d, p_l, n_l, tmax, ta, tb,
                                                delta, d_l)
            t, pdf = _equiangular_sample(u_t, delta, d_l, ta_c, tb_c, tmax)
            return t, pdf, ok & (pdf > 0.0)
        # equiangular (also the fallback for warp/pn under splitting)
        t, pdf = _equiangular_sample(u_t, delta, d_l, ta, tb, tmax)
        return t, pdf, pdf > 0.0

    def _compute_splitting(self, scene, pix, stream):
        """Variance-splitting single scattering: the ATS traversal returns a
        SET of lights per camera ray; each gets its own distance sample and
        explicit connection (compute_single_strategy_splitting,
        point_normal.rs:2455-2580 + emitter.rs:1669-1727)."""
        from ..scene.ats import ats_sample_split
        from ..scene.emitters import _emission_at, _tri_uv_at
        from ..ops.gather import make_taker

        vol = scene.volume
        em = scene.emitters
        geom = scene.geom
        n = pix.shape[0]
        K = 8
        u_pix, stream = stream_next2d(stream, (n,))
        if not self.use_aa:
            u_pix = jnp.full_like(u_pix, 0.5)   # cli.rs:2592-2596
        o, d = generate_rays(scene.camera, pix.astype(jnp.float32) + u_pix)
        rh = intersect_rays(geom, o, d)
        tmax = jnp.where(rh.hit, rh.t, 1e7)

        u_sel, stream = stream_next(stream, (n,))
        u_pos, stream = stream_next2d(stream, (n,))
        u_stack, stream = stream_next(stream, (n, K + 32))
        tris, pdf_sel, valid, _ = ats_sample_split(
            scene.ats, o, d, tmax, u_sel, u_stack, self.splitting, K)

        from ..utils.warps import uniform_sample_triangle
        b = uniform_sample_triangle(u_pos)   # shared across split lights
        name = self.strategies[0]
        li = jnp.zeros((n, 3), jnp.float32)
        for k in range(K):
            tri = tris[:, k]
            ok = valid[:, k]
            psel = jnp.maximum(pdf_sel[:, k], 1e-30)
            from ..scene.emitters import _take_tri_cols
            ttake = make_taker(jnp.maximum(tri, 0), geom.n_pad)
            fields = ["v0", "e1", "e2", "ng", "area", "le"]
            if em.has_em_uv:
                fields += ["vuv", "kind", "scale", "tex"]
            tc = _take_tri_cols(geom, em, ttake, fields)
            v0 = tc["v0"]
            p_l = v0 + b[..., 0:1] * tc["e1"] + b[..., 1:2] * tc["e2"]
            n_l = tc["ng"]
            area = tc["area"]
            le = tc["le"]
            if em.has_em_uv:
                le = _emission_at(em, tc["kind"], tc["scale"], tc["tex"], le,
                                  _tri_uv_at(tc["vuv"], b))
            # flux = Le*pi*area/pdf_sel, then *correct_flux(=1/pi)
            flux = le * (area / psel)[:, None]

            u_t, stream = stream_next(stream, (n,))
            t, pdf_t, d_ok = self._sample_distance_single(
                scene, name, u_t, o, d, p_l, n_l, tmax)
            x_t = o + d * t[:, None]
            dv = p_l - x_t
            t_light = jnp.maximum(jnp.linalg.norm(dv, axis=-1), 1e-20)
            d_hat = dv / t_light[:, None]
            g_f = jnp.sum(n_l * (-d_hat), -1) / t_light ** 2
            ph = phase_eval(vol.phase_g, -d, d_hat)
            vis = visible(geom, x_t, p_l)
            contrib = (vol.sigma_s[None, :] * flux
                       * transmittance(vol, t) * transmittance(vol, t_light)
                       * (g_f * ph / jnp.maximum(pdf_t, 1e-30))[:, None])
            use = ok & d_ok & vis & (g_f > 0.0) & (t > 0.0) & (t < tmax)
            li = li + jnp.where(use[:, None], contrib, 0.0)
        return li

    def compute_pixel(self, scene, pix, stream):
        assert scene.volume is not None, "point_normal needs a medium"
        if self.splitting is not None and scene.ats is not None:
            return self._compute_splitting(scene, pix, stream)
        vol = scene.volume
        n = pix.shape[0]
        u_pix, stream = stream_next2d(stream, (n,))
        if not self.use_aa:
            u_pix = jnp.full_like(u_pix, 0.5)   # cli.rs:2592-2596
        o, d = generate_rays(scene.camera, pix.astype(jnp.float32) + u_pix)
        rh = intersect_rays(scene.geom, o, d)
        tmax = jnp.where(rh.hit, rh.t, 1e7)

        # one light sample shared by all strategies (as the reference does for
        # its per-strategy evaluations)
        u_sel, stream = stream_next(stream, (n,))
        u_lpos, stream = stream_next2d(stream, (n,))

        li = jnp.zeros((n, 3), jnp.float32)
        n_strats = len(self.strategies)

        # shared per-lane light sample + angular parametrizations
        ls0 = sample_light(scene.emitters, scene.geom, o, u_sel, u_lpos)
        eq = _equiangular_params(o, d, ls0.p, tmax)
        delta, d_l, ta, tb = eq
        ta_c, tb_c, valid_c = _equiangular_clamp(
            o, d, ls0.p, ls0.n, tmax, ta, tb, delta, d_l)
        eqc = (delta, d_l, ta_c, tb_c, valid_c)
        wparams = (self._warp_params(scene, o, d, ls0, eq)
                   if STRATEGY_WARP in self.strategies else None)
        setups = self._product_setups(scene, o, d, ls0, eq, eqc)

        def _angular_to_dist(theta, pdf_ang, valid):
            """theta → distance + pdf, equiangular fallback on invalid lanes."""
            tt = d_l * jnp.tan(theta)
            t_s = jnp.clip(tt + delta, 0.0, tmax)
            pdf_s = pdf_ang * d_l / jnp.maximum(d_l ** 2 + tt ** 2, 1e-30)
            t_eq, pdf_eq = _equiangular_sample(u_t, delta, d_l, ta, tb, tmax)
            return (jnp.where(valid, t_s, t_eq),
                    jnp.where(valid, pdf_s, pdf_eq))

        for name in self.strategies:
            u_t, stream = stream_next(stream, (n,))
            if name == STRATEGY_TR:
                from ..scene.volume import volume_sample_distance
                sd = volume_sample_distance(vol, tmax, u_t)
                t = sd.t
                pdf_t = sd.pdf
                strat_valid = ~sd.exited
            elif name == STRATEGY_EQUIANGULAR:
                t, pdf_t = _equiangular_sample(u_t, delta, d_l, ta, tb, tmax)
                strat_valid = pdf_t > 0.0
            elif name == STRATEGY_WARP:
                x, pdf_ang = self._warp_chain_sample(wparams, u_t)
                theta = ta + x * (tb - ta)
                tt = d_l * jnp.tan(theta)
                t = jnp.clip(tt + delta, 0.0, tmax)
                jac = d_l / jnp.maximum(d_l ** 2 + tt ** 2, 1e-30)
                pdf_t = pdf_ang / jnp.maximum(tb - ta, 1e-12) * jac
                strat_valid = pdf_t > 0.0
            elif name in _TAYLOR:
                from . import point_normal_poly as pp
                c, st = setups[name]
                theta, pdf_ang = pp.taylor_sample(c, st, u_t)
                t, pdf_t = _angular_to_dist(theta, pdf_ang, st["valid"])
                strat_valid = pdf_t > 0.0
            elif name in _PN_TAYLOR:
                from . import point_normal_poly as pp
                c, st = setups[name]
                theta, pdf_ang = pp.pn_taylor_sample(c, st, u_t)
                t, pdf_t = _angular_to_dist(theta, pdf_ang, st["valid"])
                strat_valid = pdf_t > 0.0
            elif name in _BEST:
                from . import point_normal_poly as pp
                c, st, wp = setups[name]
                if name == STRATEGY_PN_BEST:
                    theta1, pdf_ang = pp.pn_taylor_sample(c, st, u_t)
                    dom_a, dom_b = ta_c, tb_c
                else:
                    theta1, pdf_ang = pp.taylor_sample(c, st, u_t)
                    dom_a, dom_b = ta, tb
                theta, pdf_ang = self._best_compose_sample(
                    theta1, pdf_ang, wp, dom_a, dom_b)
                t, pdf_t = _angular_to_dist(theta, pdf_ang, st["valid"])
                strat_valid = pdf_t > 0.0
            elif name == STRATEGY_PN:
                from . import point_normal_poly as pp
                a_n, b_n, ok = setups[STRATEGY_PN]
                theta = pp.pn_invert(a_n, b_n, ta_c, tb_c, u_t)
                pdf_ang = jnp.abs(a_n * jnp.cos(theta) + b_n * jnp.sin(theta))
                t, pdf_t = _angular_to_dist(theta, pdf_ang, ok)
                strat_valid = pdf_t > 0.0
            else:
                t, pdf_t = _equiangular_sample(u_t, delta, d_l, ta_c, tb_c, tmax)
                strat_valid = valid_c & (pdf_t > 0.0)

            x_t = o + d * t[:, None]
            # re-evaluate the light sample from the scatter point
            ls = sample_light(scene.emitters, scene.geom, x_t, u_sel, u_lpos)
            tr_cam = transmittance(vol, t)

            # balance-heuristic MIS over distance strategies
            pdf_sum = jnp.zeros_like(pdf_t)
            for other in self.strategies:
                pdf_sum = pdf_sum + self._distance_pdfs(
                    scene, other, t, o, d, ls, tmax, eq, eqc, wparams, setups)
            w = jnp.where(pdf_t > 0.0,
                          pdf_t / jnp.maximum(pdf_sum, 1e-30), 0.0)

            if self.connection == "phase":
                # PHASE connection: sample the phase function, intersect the
                # emitter geometry directly (point_normal.rs:2373-2395)
                from ..scene.volume import phase_sample
                from ..scene import fill_hit, emitted_radiance
                u_ph, stream = stream_next2d(stream, (n,))
                d_ph, w_ph, _ = phase_sample(vol.phase_g, -d, u_ph)
                rh2 = intersect_rays(scene.geom, x_t, d_ph)
                hit2 = fill_hit(scene, x_t, d_ph, rh2)
                le = emitted_radiance(scene.emitters, scene.geom, hit2.tri,
                                      d_ph, uv=hit2.uv, attr=hit2.attr)
                tr_light = transmittance(vol, jnp.where(rh2.hit, rh2.t, 0.0))
                contrib = (vol.sigma_s[None, :] * tr_cam * tr_light * w_ph
                           * le * (w / jnp.maximum(pdf_t, 1e-30))[:, None])
                ok = (strat_valid & hit2.valid & hit2.is_light
                      & (t > 0.0) & (t < tmax))
            else:
                tr_light = transmittance(vol, ls.dist)
                ph = phase_eval(vol.phase_g, -d, ls.d)
                vis = visible(scene.geom, x_t, ls.p)
                contrib = (vol.sigma_s[None, :] * tr_cam * tr_light
                           * ls.weight
                           * (ph / jnp.maximum(pdf_t, 1e-30) * w)[:, None])
                ok = strat_valid & ls.valid & vis & (t > 0.0) & (t < tmax)
            li = li + jnp.where(ok[:, None], contrib, 0.0)

        return li
