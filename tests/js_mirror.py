"""Line-by-line Python transcription of tools/web_tracer.js.

There is NO JavaScript runtime, browser, or wasm toolchain in this image
(checked: no node/quickjs/duktape/deno/bun, no Chrome/Chromium/firefox, no
clang wasm32 target, no dukpy/py_mini_racer/pythonmonkey), so the in-browser
client tracer cannot be *executed* offline. This module is the strongest
available stand-in: a faithful transcription of the JS — the same mulberry32
/ pixelRng integer semantics (JS ToInt32 / ToUint32 / Math.imul bit rules
reproduced with explicit uint32 masking), the same random-draw ORDER, the
same transport structure — which tests/test_viewer.py z-tests against the
independent scalar oracle (tests/oracle_pt.py). An algorithm or scene-export
bug in the client tracer shows up here; only a pure JS-syntax typo would
escape (and the page fails loudly in any real browser if it does).

Keep this file in lockstep with tools/web_tracer.js: the agreement test
pins the JS file's sha256 (tests/test_viewer.py) so edits there fail tests
until this transcription is re-checked.
"""
from __future__ import annotations

import math

import numpy as np

_M32 = 0xFFFFFFFF


def _imul(a: int, b: int) -> int:
    """JS Math.imul: uint32 multiply, truncated to 32 bits (bit pattern)."""
    return ((a & _M32) * (b & _M32)) & _M32


def mulberry32(seed: int):
    """Bit-exact mulberry32 (web_tracer.js): all JS int coercions reduce to
    mod-2^32 bit arithmetic, so plain uint32 masking reproduces them."""
    a = seed & _M32

    def rand() -> float:
        nonlocal a
        a = (a + 0x6D2B79F5) & _M32
        t = _imul(a ^ (a >> 15), 1 | a)
        t = ((t + _imul(t ^ (t >> 7), 61 | t)) ^ t) & _M32
        return ((t ^ (t >> 14)) & _M32) / 4294967296.0

    return rand


def pixel_rng(x: int, y: int, pass_: int, seed: int):
    """web_tracer.js pixelRng: splitmix-style avalanche of the packed
    (pixel, pass, seed) counter."""
    h = (((x * 0x9E3779B1) & _M32) ^ ((y * 0x85EBCA6B) & _M32)
         ^ ((pass_ * 0xC2B2AE35) & _M32) ^ (seed & _M32))
    h = _imul(h ^ (h >> 16), 0x7FEB352D)
    h = _imul(h ^ (h >> 15), 0x846CA68B)
    h ^= h >> 16
    return mulberry32(h)


_EPS_ABS = 1e-4
_EPS_REL = 2e-5


class MirrorScene:
    """Transcription of web_tracer.js WebScene over a scene_to_web_json
    dict. The per-triangle intersection loop is numpy-vectorized (identical
    formulas; JS iterates) — everything else is scalar like the JS."""

    def __init__(self, desc: dict):
        self.v0 = np.asarray(desc["v0"], np.float64)
        self.e1 = np.asarray(desc["e1"], np.float64)
        self.e2 = np.asarray(desc["e2"], np.float64)
        self.kd = np.asarray(desc["kd"], np.float64)
        n_tri = len(self.v0)
        self.kind = list(desc.get("kind") or [0] * n_tri)
        self.ks = desc.get("ks")
        self.kt = desc.get("kt")
        self.eta = desc.get("eta")
        self.expo = desc.get("exponent")
        self.wspec = desc.get("weight_specular")
        self.le = np.asarray(desc["le"], np.float64)
        c = np.cross(self.e1, self.e2)
        ln = np.linalg.norm(c, axis=-1)
        self.ng = np.where(ln[:, None] > 0, c / np.maximum(ln[:, None], 1e-300),
                           np.array([0.0, 0.0, 1.0]))
        self.area = 0.5 * ln
        self.is_light = np.linalg.norm(self.le, axis=-1) > 0
        self.em_tri = list(desc["em_tri"])
        prob = list(desc["em_prob"])
        self.em_cdf = np.cumsum(prob)
        self.pdf_area = np.zeros(len(self.v0))
        for i, t in enumerate(self.em_tri):
            self.pdf_area[t] = prob[i] / self.area[t]
        self.s2c = np.asarray(desc["cam"]["s2c"], np.float64)
        self.to_world = np.asarray(desc["cam"]["to_world"], np.float64)
        self.width = int(desc["cam"]["width"])
        self.height = int(desc["cam"]["height"])
        self.max_depth = desc.get("max_depth", 5)
        self.min_depth = desc.get("min_depth", 0) or 0
        self.seed = int(desc.get("seed", 0))
        self.img = np.zeros((self.height * self.width, 3))
        self.img2 = np.zeros((self.height * self.width, 3))
        self.nb_samples = np.zeros(self.height * self.width, np.int64)

    # ------------------------------------------------------------- camera
    def camera_ray(self, px: float, py: float):
        s = np.array([px / self.width, py / self.height, 0.0, 1.0])
        q = self.s2c @ s
        d = q[:3] / q[3]
        d = d / np.linalg.norm(d)
        dw = self.to_world[:3, :3] @ d
        return self.to_world[:3, 3].copy(), dw

    # ------------------------------------------------------ intersection
    def intersect(self, o, d, tmax=np.inf):
        pvec = np.cross(np.broadcast_to(d, self.e2.shape), self.e2)
        det = np.einsum("ij,ij->i", self.e1, pvec)
        ok = np.abs(det) >= 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvec = o - self.v0
        u = np.einsum("ij,ij->i", tvec, pvec) * inv
        qvec = np.cross(tvec, self.e1)
        v = (qvec @ d) * inv
        t = np.einsum("ij,ij->i", self.e2, qvec) * inv
        hit = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) \
            & (t > _EPS_ABS) & (t < tmax)
        if not hit.any():
            return -1, tmax
        t = np.where(hit, t, np.inf)
        tri = int(np.argmin(t))
        return tri, float(t[tri])

    def occluded(self, p0, p1) -> bool:
        d = p1 - p0
        dist = float(np.linalg.norm(d))
        if dist <= 0.0:
            return True
        tri, _ = self.intersect(p0, d / dist, dist * (1.0 - 1e-4))
        return tri >= 0

    def offset(self, p, n, d):
        eps = _EPS_ABS + _EPS_REL * float(np.max(np.abs(p)))
        s = 1.0 if float(n @ d) >= 0.0 else -1.0
        return p + n * (eps * s)

    # ---------------------------------------------------------- sampling
    def sample_light(self, p_ref, rng):
        u = rng()
        i = 0
        while i < len(self.em_cdf) - 1 and u > self.em_cdf[i]:
            i += 1
        tri = self.em_tri[i]
        su = math.sqrt(rng())
        b1 = 1.0 - su
        b2 = rng() * su
        p_l = self.v0[tri] + b1 * self.e1[tri] + b2 * self.e2[tri]
        delta = p_l - p_ref
        dist = float(np.linalg.norm(delta))
        if dist <= 0.0:
            return None
        d = delta / dist
        cos_l = -float(self.ng[tri] @ d)
        if cos_l <= 0.0:
            return None
        g = cos_l / (dist * dist)
        pdf_a = self.pdf_area[tri]
        return {
            "d": d, "dist": dist, "p_l": p_l,
            "weight": self.le[tri] * (g / pdf_a),
            "pdf_sa": pdf_a * dist * dist / cos_l,
        }

    def light_pdf_sa(self, tri, p_ref, p_hit, d) -> float:
        cos_l = -float(self.ng[tri] @ d)
        if cos_l <= 0.0 or not self.is_light[tri]:
            return 0.0
        return float(self.pdf_area[tri]
                     * np.sum((p_hit - p_ref) ** 2) / cos_l)

    def onb(self, n):
        a = np.zeros(3)
        ax, ay, az = abs(n[0]), abs(n[1]), abs(n[2])
        a[(0 if ax <= az else 2) if ax <= ay else (1 if ay <= az else 2)] = 1.0
        t = np.cross(n, a)
        t = t / np.linalg.norm(t)
        return t, np.cross(n, t)

    def cosine_hemisphere_uv(self, n, u1, u2):
        r = math.sqrt(u1)
        phi = 2.0 * math.pi * u2
        x, y = r * math.cos(phi), r * math.sin(phi)
        z = math.sqrt(max(1.0 - u1, 0.0))
        t, b = self.onb(n)
        return x * t + y * b + z * n, z / math.pi

    def cosine_hemisphere(self, n, rng):
        return self.cosine_hemisphere_uv(n, rng(), rng())

    def bsdf_eval_pdf(self, tri, n, d_in_ray, d_out):
        cos_o = float(n @ d_out)
        if cos_o <= 0.0:
            return np.zeros(3), 0.0
        kd = self.kd[tri]
        if self.kind[tri] == 0:
            return kd / math.pi * cos_o, cos_o / math.pi
        wi = -np.asarray(d_in_ray)
        refl = 2.0 * float(n @ wi) * n - wi
        alpha = float(refl @ d_out)
        e, ws = self.expo[tri], self.wspec[tri]
        spec_scale = 0.0
        pdf_s = 0.0
        if alpha > 0.0:
            ae = alpha ** e
            spec_scale = ae * (e + 2.0) / (2.0 * math.pi)
            pdf_s = ws * ae * (e + 1.0) / (2.0 * math.pi)
        f = np.asarray(self.ks[tri]) * spec_scale + kd * cos_o / math.pi
        return f, pdf_s + (1.0 - ws) * cos_o / math.pi

    def bsdf_sample(self, tri, n, d_in_ray, rng):
        if self.kind[tri] == 0:
            d_new, pdf = self.cosine_hemisphere(n, rng)
            if pdf <= 0.0:
                return None
            return d_new, pdf, self.kd[tri].copy()
        e, ws = self.expo[tri], self.wspec[tri]
        u, v = rng(), rng()
        if u < ws:
            u = u / ws
            wi = -np.asarray(d_in_ray)
            refl = 2.0 * float(n @ wi) * n - wi
            cos_a = v ** (1.0 / (e + 1.0))
            sin_a = math.sqrt(max(1.0 - cos_a * cos_a, 0.0))
            phi = 2.0 * math.pi * u
            t, b = self.onb(refl)
            d_new = (sin_a * math.cos(phi)) * t \
                + (sin_a * math.sin(phi)) * b + cos_a * refl
            if float(n @ d_new) <= 0.0:
                return None
        else:
            u = (u - ws) / (1.0 - ws)
            d_new, _ = self.cosine_hemisphere_uv(n, u, v)
        f, pdf = self.bsdf_eval_pdf(tri, n, d_in_ray, d_new)
        if pdf <= 0.0:
            return None
        return d_new, pdf, f / pdf

    @staticmethod
    def fresnel_dielectric(cos_i, eta):
        if eta == 1.0:
            return 0.0, -cos_i
        scale = (1.0 / eta) if cos_i > 0.0 else eta
        cos_t2 = 1.0 - (1.0 - cos_i * cos_i) * (scale * scale)
        if cos_t2 <= 0.0:
            return 1.0, 0.0
        ci = abs(cos_i)
        ct = math.sqrt(cos_t2)
        rs = (ci - eta * ct) / (ci + eta * ct)
        rp = (eta * ci - ct) / (eta * ci + ct)
        if cos_i > 0.0:
            ct = -ct
        return 0.5 * (rs * rs + rp * rp), ct

    def glass_sample(self, tri, ng, d_in_ray, rng):
        t, b = self.onb(ng)
        wi = np.array([-float(d_in_ray @ t), -float(d_in_ray @ b),
                       -float(d_in_ray @ ng)])
        eta = self.eta[tri]
        inv_eta = 1.0 / eta
        fresnel, cos_t = self.fresnel_dielectric(wi[2], eta)
        if rng() <= fresnel:
            wo = np.array([-wi[0], -wi[1], wi[2]])
            weight = np.asarray(self.ks[tri], np.float64).copy()
        else:
            scale = -inv_eta if cos_t < 0.0 else -eta
            wo = np.array([scale * wi[0], scale * wi[1], cos_t])
            factor = inv_eta if cos_t < 0.0 else eta
            weight = np.asarray(self.kt[tri]) * (factor * factor)
        return wo[0] * t + wo[1] * b + wo[2] * ng, weight

    # ---------------------------------------------------------- transport
    def radiance(self, o, d, rng, k, prev_pdf, prev_delta):
        tri, t_hit = self.intersect(o, d)
        L = np.zeros(3)
        if tri < 0:
            return L
        p_hit = o + d * t_hit
        ng = self.ng[tri]
        if self.is_light[tri] and k >= self.min_depth \
                and -float(ng @ d) > 0.0:
            w = 1.0 if prev_delta else _balance(
                prev_pdf, self.light_pdf_sa(tri, o, p_hit, d))
            L = L + self.le[tri] * w
        can_expand = self.max_depth is None or k + 1 < self.max_depth
        if not can_expand:
            return L

        # glass keeps the UNFLIPPED geometric frame
        is_delta = self.kind[tri] == 2
        n = ng
        if not is_delta and not self.is_light[tri] and float(n @ d) > 0.0:
            n = -n

        if k + 1 >= self.min_depth and not is_delta:
            ls = self.sample_light(p_hit, rng)
            if ls is not None:
                f, pdf_other = self.bsdf_eval_pdf(tri, n, d, ls["d"])
                if float(np.max(f)) > 0.0:
                    p_shadow = self.offset(p_hit, ng, ls["d"])
                    if not self.occluded(p_shadow, ls["p_l"]):
                        w = _balance(ls["pdf_sa"], pdf_other)
                        L = L + f * ls["weight"] * w

        next_delta = False
        if is_delta:
            d_new, weight = self.glass_sample(tri, ng, d, rng)
            pdf_dir = 1.0
            next_delta = True
        else:
            res = self.bsdf_sample(tri, n, d, rng)
            if res is None:
                return L
            d_new, pdf_dir, weight = res
        if float(np.max(weight)) <= 0.0:
            return L
        o_new = self.offset(p_hit, ng, d_new)
        ln = self.radiance(o_new, d_new, rng, k + 1, pdf_dir, next_delta)
        return L + weight * ln

    # --------------------------------------------------------------- film
    def render_block(self, x0, y0, sx, sy, pass_):
        for y in range(y0, min(y0 + sy, self.height)):
            for x in range(x0, min(x0 + sx, self.width)):
                rng = pixel_rng(x, y, pass_, self.seed)
                o, d = self.camera_ray(x + rng(), y + rng())
                li = self.radiance(o, d, rng, 0, 1.0, True)
                idx = y * self.width + x
                if np.isfinite(li).all() and (li >= 0.0).all():
                    self.img[idx] += li
                    self.img2[idx] += li * li
                self.nb_samples[idx] += 1

    def run(self, n_passes: int):
        """The /local page's driver loop: 16x16 blocks, whole-image passes."""
        for p in range(n_passes):
            for y0 in range(0, self.height, 16):
                for x0 in range(0, self.width, 16):
                    self.render_block(x0, y0, 16, 16, p)

    def mean_linear(self):
        ns = np.maximum(self.nb_samples, 1)[:, None]
        return (self.img / ns).reshape(self.height, self.width, 3)

    def var_of_mean(self):
        n = self.nb_samples[:, None]
        m = self.img / np.maximum(n, 1)
        s2 = np.maximum((self.img2 - n * m * m) / np.maximum(n - 1, 1), 0.0)
        return np.where(n >= 2, s2 / np.maximum(n, 1), 0.0).reshape(
            self.height, self.width, 3)


def _balance(pdf_a: float, pdf_b: float) -> float:
    return 0.0 if pdf_a <= 0.0 else pdf_a / (pdf_a + pdf_b)
