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
escape (and tests/test_viewer.py's static param-redeclaration lint catches
the one known class of those).

Round-5 scope (VERDICT r4 item 8), in lockstep with the JS: two-slot
materials (diffuse / phong / glass / metal smooth+rough / rough substrate /
blend) and area + point + directional + constant-env emitter atoms.

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


class _Slot:
    """One atomic material slot (desc['a'] / desc['b'] columns)."""

    def __init__(self, d: dict):
        self.kind = list(d["kind"])
        self.kd = np.asarray(d["kd"], np.float64)
        self.ks = np.asarray(d["ks"], np.float64)
        self.eta_c = np.asarray(d["eta_c"], np.float64)
        self.k_c = np.asarray(d["k_c"], np.float64)
        self.alpha = list(d["alpha"])
        self.ggx = list(d["ggx"])
        self.exponent = list(d["exponent"])
        self.wspec = list(d["wspec"])
        self.tex_kind = list(d["tex_kind"])
        self.tex_c1 = np.asarray(d["tex_c1"], np.float64)
        self.tex_scale = np.asarray(d["tex_scale"], np.float64)
        self.tex_offset = np.asarray(d["tex_offset"], np.float64)
        self.tex_lw = list(d["tex_lw"])
        self.tex_img = list(d["tex_img"])


class MirrorScene:
    """Transcription of web_tracer.js WebScene over a scene_to_web_json
    dict. The per-triangle intersection loop is numpy-vectorized (identical
    formulas; JS iterates) — everything else is scalar like the JS."""

    def __init__(self, desc: dict):
        self.v0 = np.asarray(desc["v0"], np.float64)
        self.e1 = np.asarray(desc["e1"], np.float64)
        self.e2 = np.asarray(desc["e2"], np.float64)
        self.a = _Slot(desc["a"])
        self.b = _Slot(desc["b"])
        self.blend_w = list(desc["blend_w"])
        vv = desc.get("vuv")
        self.vuv = None if vv is None else np.asarray(vv, np.float64)
        tx = desc.get("textures")
        self.textures = None if tx is None else np.asarray(tx, np.float64)
        self.kt = np.asarray(desc["kt"], np.float64)
        self.eta = list(desc["eta"])
        self.le = np.asarray(desc["le"], np.float64)
        c = np.cross(self.e1, self.e2)
        ln = np.linalg.norm(c, axis=-1)
        self.ng = np.where(ln[:, None] > 0, c / np.maximum(ln[:, None], 1e-300),
                           np.array([0.0, 0.0, 1.0]))
        self.area = 0.5 * ln
        self.is_light = np.linalg.norm(self.le, axis=-1) > 0
        n_tri = len(self.v0)
        # has a DELTA component -> NEE skipped (BSDFType::is_smooth)
        self.smooth = [
            self.a.kind[i] == 2
            or (self.a.kind[i] == 3 and self.a.alpha[i] <= 0)
            or (self.b.kind[i] == 3 and self.b.alpha[i] <= 0)
            for i in range(n_tri)]
        # emitter atoms: k = 0 tri / 1 point / 2 directional / 3 const env
        self.atoms = list(desc["atoms"])
        self.atom_prob = list(desc["atom_prob"])
        self.points = [(np.asarray(p, np.float64), np.asarray(i, np.float64))
                       for p, i in (desc.get("points") or [])]
        self.dirs = [(np.asarray(dn, np.float64), np.asarray(i, np.float64))
                     for dn, i in (desc.get("dirs") or [])]
        ec = desc.get("env_color")
        self.env_color = None if ec is None else np.asarray(ec, np.float64)
        # textured envmap (emitter.rs:300-568): luminance*sin(theta) 2D CDF
        ei = desc.get("env_img")
        self.env_img = None if ei is None else np.asarray(ei, np.float64)
        if self.env_img is not None:
            eh, ew = self.env_img.shape[:2]
            sw = np.sin((np.arange(eh) + 0.5) * math.pi / eh)[:, None]
            lum = np.asarray([0.2126, 0.7152, 0.0722])
            self.env_lum = (self.env_img @ lum) * sw
            row = self.env_lum.sum(1)
            tot = max(float(row.sum()), 1e-300)
            self.env_marg_cdf = np.cumsum(row) / tot
            cnd = np.cumsum(self.env_lum, axis=1)
            rs = cnd[:, -1:]
            self.env_cond_cdf = np.where(
                rs > 0, cnd / np.maximum(rs, 1e-300),
                (np.arange(ew) + 1.0) / ew)
            self.env_int = tot / (eh * ew)
        self.atom_cdf = np.cumsum(self.atom_prob)
        self.env_prob = 0.0
        for i, at in enumerate(self.atoms):
            if at["k"] == 3:
                self.env_prob = self.atom_prob[i]
        self.pdf_area = np.zeros(n_tri)
        for i, at in enumerate(self.atoms):
            if at["k"] == 0:
                self.pdf_area[at["ref"]] = \
                    self.atom_prob[i] / self.area[at["ref"]]
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
            return -1, tmax, 0.0, 0.0
        t = np.where(hit, t, np.inf)
        tri = int(np.argmin(t))
        return tri, float(t[tri]), float(u[tri]), float(v[tri])

    def uv_at(self, tri, b1, b2):
        if self.vuv is None:               # untextured export ships no uvs
            return np.zeros(2)
        w = self.vuv[tri]
        w0 = 1.0 - b1 - b2
        return w0 * w[0] + b1 * w[1] + b2 * w[2]

    def albedo(self, sl: _Slot, tri, uv):
        """Diffuse-slot color at uv (BSDFColor, mod.rs:11-121): constant /
        bitmap / checkerboard (Rust as-i32 truncation + C-style signed %,
        via math.fmod) / grid."""
        tk = sl.tex_kind[tri]
        if tk == 0:
            return sl.kd[tri]
        sc, of = sl.tex_scale[tri], sl.tex_offset[tri]
        su = [uv[0] * sc[0] + of[0], uv[1] * sc[1] + of[1]]
        if tk == 2:                         # checkerboard
            x = 2 * int(math.fmod(int(su[0] * 2.0), 2)) - 1
            y = 2 * int(math.fmod(int(su[1] * 2.0), 2)) - 1
            return sl.kd[tri] if x * y == 1 else sl.tex_c1[tri]
        if tk == 3:                         # grid
            gx = su[0] - math.floor(su[0])
            gy = su[1] - math.floor(su[1])
            if gx > 0.5:
                gx -= 1.0
            if gy > 0.5:
                gy -= 1.0
            lw = sl.tex_lw[tri]
            return (sl.kd[tri] if (abs(gx) < lw or abs(gy) < lw)
                    else sl.tex_c1[tri])
        img = self.textures[sl.tex_img[tri]]
        th, tw = img.shape[:2]
        fu = uv[0] - math.floor(uv[0])
        fv = uv[1] - math.floor(uv[1])
        xi = min(int(fu * tw), tw - 1)
        yi = min(int((1.0 - fv) * th), th - 1)
        return img[yi, xi]

    def occluded(self, p0, p1) -> bool:
        d = p1 - p0
        dist = float(np.linalg.norm(d))
        if dist <= 0.0:
            return True
        tri = self.intersect(p0, d / dist, dist * (1.0 - 1e-4))[0]
        return tri >= 0

    def occluded_ray(self, p0, d) -> bool:
        tri = self.intersect(p0, d, np.inf)[0]
        return tri >= 0

    def offset(self, p, n, d):
        eps = _EPS_ABS + _EPS_REL * float(np.max(np.abs(p)))
        s = 1.0 if float(n @ d) >= 0.0 else -1.0
        return p + n * (eps * s)

    # ---------------------------------------------------------- sampling
    def sample_light(self, p_ref, rng):
        u = rng()
        i = 0
        while i < len(self.atom_cdf) - 1 and u > self.atom_cdf[i]:
            i += 1
        at = self.atoms[i]
        prob = self.atom_prob[i]
        if at["k"] == 0:
            tri = at["ref"]
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
                "d": d, "dist": dist, "p_l": p_l, "is_delta": False,
                "weight": self.le[tri] * (g / pdf_a),
                "pdf_sa": pdf_a * dist * dist / cos_l,
            }
        if at["k"] == 1:                    # point light: I / d^2
            pos, inten = self.points[at["ref"]]
            delta = pos - p_ref
            dist = float(np.linalg.norm(delta))
            if dist <= 0.0:
                return None
            d = delta / dist
            return {"d": d, "dist": dist, "p_l": pos, "is_delta": True,
                    "pdf_sa": 0.0,
                    "weight": inten / (dist * dist * prob)}
        if at["k"] == 2:                    # directional: I, ray to infinity
            dn, inten = self.dirs[at["ref"]]
            return {"d": -dn, "dist": None, "p_l": None, "is_delta": True,
                    "pdf_sa": 0.0, "weight": inten / prob}
        if self.env_img is None:
            # constant env: uniform sphere, pdf = prob / 4pi
            z = 1.0 - 2.0 * rng()
            r = math.sqrt(max(1.0 - z * z, 0.0))
            phi = 2.0 * math.pi * rng()
            d = np.array([r * math.cos(phi), r * math.sin(phi), z])
            pdf_sa = prob / (4.0 * math.pi)
            return {"d": d, "dist": None, "p_l": None, "is_delta": False,
                    "pdf_sa": pdf_sa, "weight": self.env_color / pdf_sa}
        # textured env: marginal row CDF then in-row conditional + jitter
        eh, ew = self.env_img.shape[:2]
        uy = rng()
        yi = 0
        while yi < eh - 1 and uy > self.env_marg_cdf[yi]:
            yi += 1
        ux = rng()
        xi = 0
        while xi < ew - 1 and ux > self.env_cond_cdf[yi][xi]:
            xi += 1
        x = xi + rng()
        y = yi + rng()
        phi = 2.0 * math.pi * x / ew
        theta = math.pi * y / eh
        st, ct = math.sin(theta), math.cos(theta)
        if st <= 0.0:
            return None
        d = np.array([st * math.cos(phi), st * math.sin(phi), ct])
        cell = self.env_lum[yi, xi] / max(self.env_int, 1e-300)
        pdf_sa = prob * cell / (2.0 * math.pi * math.pi * st)
        if pdf_sa <= 0.0:
            return None
        return {"d": d, "dist": None, "p_l": None, "is_delta": False,
                "pdf_sa": pdf_sa, "weight": self.env_img[yi, xi] / pdf_sa}

    def light_pdf_sa(self, tri, p_ref, p_hit, d) -> float:
        cos_l = -float(self.ng[tri] @ d)
        if cos_l <= 0.0 or not self.is_light[tri]:
            return 0.0
        return float(self.pdf_area[tri]
                     * np.sum((p_hit - p_ref) ** 2) / cos_l)

    def env_radiance(self, d):
        if self.env_img is None:
            return self.env_color
        theta = math.acos(max(-1.0, min(1.0, d[2])))
        phi = math.atan2(d[1], d[0])
        if phi < 0.0:
            phi += 2.0 * math.pi
        eh, ew = self.env_img.shape[:2]
        xi = min(int(phi / (2.0 * math.pi) * ew), ew - 1)
        yi = min(int(theta / math.pi * eh), eh - 1)
        return self.env_img[yi, xi]

    def env_pdf_sa(self, d=None) -> float:
        if self.env_img is None:
            return self.env_prob / (4.0 * math.pi)
        theta = math.acos(max(-1.0, min(1.0, d[2])))
        phi = math.atan2(d[1], d[0])
        if phi < 0.0:
            phi += 2.0 * math.pi
        eh, ew = self.env_img.shape[:2]
        xi = min(int(phi / (2.0 * math.pi) * ew), ew - 1)
        yi = min(int(theta / math.pi * eh), eh - 1)
        cell = self.env_lum[yi, xi] / max(self.env_int, 1e-300)
        st = math.sin(theta)
        if st <= 0.0:
            return 0.0
        return self.env_prob * cell / (2.0 * math.pi * math.pi * st)

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

    # ------------------- microfacet + fresnel helpers (local frame) -----
    @staticmethod
    def fresnel_conductor(ct, eta3, k3):
        out = np.zeros(3)
        ct2 = ct * ct
        st2 = 1.0 - ct2
        st4 = st2 * st2
        for c in range(3):
            eta, k = eta3[c], k3[c]
            t1 = eta * eta - k * k - st2
            a2pb2 = math.sqrt(max(t1 * t1 + 4.0 * k * k * eta * eta, 0.0))
            a = math.sqrt(max(0.5 * (a2pb2 + t1), 0.0))
            term1 = a2pb2 + ct2
            term2 = 2.0 * a * abs(ct)
            rs2 = (term1 - term2) / (term1 + term2)
            term3 = a2pb2 * ct2 + st4
            term4 = term2 * st2
            out[c] = 0.5 * (rs2 + rs2 * (term3 - term4) / (term3 + term4))
        return out

    @staticmethod
    def schlick(rs, ct):
        p = (1.0 - ct) ** 5
        return rs + (1.0 - rs) * p

    @staticmethod
    def mf_eval(ggx, alpha, m):
        ct = m[2]
        if ct <= 0.0:
            return 0.0
        ct2 = ct * ct
        bexp = (m[0] * m[0] + m[1] * m[1]) / (alpha * alpha) / ct2
        if ggx:
            root = (1.0 + bexp) * ct2
            res = 1.0 / (math.pi * alpha * alpha * root * root)
        else:
            res = math.exp(-bexp) / (math.pi * alpha * alpha * ct2 * ct2)
        return 0.0 if res * ct < 1e-20 else res

    @staticmethod
    def mf_sample(ggx, alpha, u1, u2):
        sp = math.sin(2.0 * math.pi * u2)
        cp = math.cos(2.0 * math.pi * u2)
        a2 = alpha * alpha
        if ggx:
            t2 = a2 * u1 / max(1.0 - u1, 1e-12)
            ct = 1.0 / math.sqrt(1.0 + t2)
            tmp = 1.0 + t2 / a2
            pdf = (1.0 / math.pi) / (a2 * ct * ct * ct * tmp * tmp)
        else:
            t2 = a2 * -math.log(max(1.0 - u1, 1e-12))
            ct = 1.0 / math.sqrt(1.0 + t2)
            pdf = (1.0 - u1) / (math.pi * a2 * ct * ct * ct)
        if pdf < 1e-20:
            pdf = 0.0
        st = math.sqrt(max(1.0 - ct * ct, 0.0))
        return np.array([st * cp, st * sp, ct]), pdf

    @staticmethod
    def mf_g1(ggx, alpha, v, m):
        if float(v @ m) * v[2] <= 0.0:
            return 0.0
        ct = abs(v[2])
        st = math.sqrt(max(1.0 - ct * ct, 0.0))
        if st == 0.0:
            return 1.0
        tan_t = st / max(ct, 1e-12)
        if ggx:
            root = alpha * tan_t
            return 2.0 / (1.0 + math.sqrt(1.0 + root * root))
        a = 1.0 / (alpha * tan_t)
        if a >= 1.6:
            return 1.0
        a2 = a * a
        return (3.535 * a + 2.181 * a2) / (1.0 + 2.276 * a + 2.577 * a2)

    def mf_g(self, ggx, alpha, wi, wo, m):
        return self.mf_g1(ggx, alpha, wi, m) * self.mf_g1(ggx, alpha, wo, m)

    # ---------------------- two-slot BSDF layer -------------------------
    def atomic_eval_pdf(self, sl: _Slot, tri, n, d_in_ray, d_out, uv):
        cos_o = float(n @ d_out)
        wi_w = -np.asarray(d_in_ray)
        cos_i = float(n @ wi_w)
        if cos_o <= 0.0 or cos_i <= 0.0:
            return np.zeros(3), 0.0
        kind = sl.kind[tri]
        kd = self.albedo(sl, tri, uv)
        if kind == 0:
            return kd / math.pi * cos_o, cos_o / math.pi
        if kind == 1:
            refl = 2.0 * float(n @ wi_w) * n - wi_w
            alpha = float(refl @ d_out)
            e, ws = sl.exponent[tri], sl.wspec[tri]
            spec_scale = 0.0
            pdf_s = 0.0
            if alpha > 0.0:
                ae = alpha ** e
                spec_scale = ae * (e + 2.0) / (2.0 * math.pi)
                pdf_s = ws * ae * (e + 1.0) / (2.0 * math.pi)
            f = sl.ks[tri] * spec_scale + kd * cos_o / math.pi
            return f, pdf_s + (1.0 - ws) * cos_o / math.pi
        if kind in (3, 4):
            t, b = self.onb(n)
            wi = np.array([float(wi_w @ t), float(wi_w @ b), cos_i])
            wo = np.array([float(d_out @ t), float(d_out @ b), cos_o])
            if kind == 3:
                alpha = sl.alpha[tri]
                if alpha <= 0.0:
                    return np.zeros(3), 0.0     # delta
                h = wi + wo
                hl = float(np.linalg.norm(h))
                if hl <= 1e-20:
                    return np.zeros(3), 0.0
                h = h / hl
                big_d = self.mf_eval(sl.ggx[tri], alpha, h)
                if big_d == 0.0:
                    return np.zeros(3), 0.0
                big_f = self.fresnel_conductor(float(wi @ h), sl.eta_c[tri],
                                               sl.k_c[tri])
                big_g = self.mf_g(sl.ggx[tri], alpha, wi, wo, h)
                f = sl.ks[tri] * big_f * (big_d * big_g / (4.0 * wi[2]))
                return f, big_d * h[2] / (4.0 * abs(float(wo @ h)))
            # substrate
            alpha = sl.alpha[tri]
            ksv = sl.ks[tri]
            h = wi + wo
            hl = float(np.linalg.norm(h))
            dscale = (28.0 / (23.0 * math.pi)) \
                * (1.0 - (1.0 - 0.5 * abs(wi[2])) ** 5) \
                * (1.0 - (1.0 - 0.5 * abs(wo[2])) ** 5)
            diff = kd * (1.0 - ksv) * dscale
            spec = np.zeros(3)
            pdf_spec = 0.0
            if hl > 1e-20:
                h = h / hl
                big_d = self.mf_eval(sl.ggx[tri], alpha, h)
                denom = 4.0 * abs(float(wi @ h)) \
                    * max(abs(wi[2]), abs(wo[2]))
                if big_d > 0.0 and denom > 0.0:
                    spec = self.schlick(ksv, float(wi @ h)) * (big_d / denom)
                    pdf_spec = big_d * h[2] / (4.0 * abs(float(wo @ h)))
            f = (diff + spec) * wo[2]
            return f, 0.5 * (wo[2] / math.pi + pdf_spec)
        return np.zeros(3), 0.0                 # glass slot: delta-only

    def bsdf_eval_pdf(self, tri, n, d_in_ray, d_out, uv):
        w = self.blend_w[tri]
        fa, pa = self.atomic_eval_pdf(self.a, tri, n, d_in_ray, d_out, uv)
        if w >= 1.0:
            return fa, pa
        fb, pb = self.atomic_eval_pdf(self.b, tri, n, d_in_ray, d_out, uv)
        return w * fa + (1.0 - w) * fb, w * pa + (1.0 - w) * pb

    def atomic_sample(self, sl: _Slot, tri, n, d_in_ray, rng, uv):
        kind = sl.kind[tri]
        if kind == 0:
            d_new, pdf = self.cosine_hemisphere(n, rng)
            if pdf <= 0.0:
                return None
            return d_new, pdf, self.albedo(sl, tri, uv).copy(), False
        if kind == 1:
            e, ws = sl.exponent[tri], sl.wspec[tri]
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
            f, pdf = self.atomic_eval_pdf(sl, tri, n, d_in_ray, d_new, uv)
            if pdf <= 0.0:
                return None
            return d_new, pdf, f / pdf, False
        if kind == 3:
            t, b = self.onb(n)
            wi_w = -np.asarray(d_in_ray)
            wi = np.array([float(wi_w @ t), float(wi_w @ b),
                           float(wi_w @ n)])
            if wi[2] <= 0.0:
                return None
            alpha = sl.alpha[tri]
            if alpha <= 0.0:
                # smooth conductor: delta mirror (metal.rs:26-37)
                wo = np.array([-wi[0], -wi[1], wi[2]])
                big_f = self.fresnel_conductor(wi[2], sl.eta_c[tri],
                                               sl.k_c[tri])
                w = sl.ks[tri] * big_f
                d_w = wo[0] * t + wo[1] * b + wo[2] * n
                return d_w, 1.0, w, True
            h, pdf_m = self.mf_sample(sl.ggx[tri], alpha, rng(), rng())
            if pdf_m <= 0.0:
                return None
            wih = float(wi @ h)
            wo = 2.0 * wih * h - wi
            if wo[2] <= 0.0:
                return None
            big_d = self.mf_eval(sl.ggx[tri], alpha, h)
            big_g = self.mf_g(sl.ggx[tri], alpha, wi, wo, h)
            big_f = self.fresnel_conductor(wih, sl.eta_c[tri], sl.k_c[tri])
            w = sl.ks[tri] * big_f * (big_d * big_g * wih / (pdf_m * wi[2]))
            pdf = pdf_m / (4.0 * abs(float(wo @ h)))
            d_w = wo[0] * t + wo[1] * b + wo[2] * n
            return d_w, pdf, w, False
        if kind == 4:
            # 0.5/0.5 lobe select with random reuse (substrate.rs:33-72)
            t, b = self.onb(n)
            wi_w = -np.asarray(d_in_ray)
            wi = np.array([float(wi_w @ t), float(wi_w @ b),
                           float(wi_w @ n)])
            if wi[2] <= 0.0:
                return None
            sx = rng()
            if sx < 0.5:
                d_new, _ = self.cosine_hemisphere_uv(n, sx * 2.0, rng())
            else:
                h, pdf_m = self.mf_sample(sl.ggx[tri], sl.alpha[tri],
                                          (sx - 0.5) * 2.0, rng())
                if pdf_m <= 0.0:
                    return None
                wih = float(wi @ h)
                wo = 2.0 * wih * h - wi
                if wo[2] <= 0.0:
                    return None
                d_new = wo[0] * t + wo[1] * b + wo[2] * n
            f, pdf = self.atomic_eval_pdf(sl, tri, n, d_in_ray, d_new, uv)
            if pdf <= 0.0:
                return None
            return d_new, pdf, f / pdf, False
        return None

    def bsdf_sample(self, tri, n, d_in_ray, rng, uv):
        w = self.blend_w[tri]
        if w >= 1.0:
            return self.atomic_sample(self.a, tri, n, d_in_ray, rng, uv)
        u = rng()
        sl = self.a if u < w else self.b
        res = self.atomic_sample(sl, tri, n, d_in_ray, rng, uv)
        if res is None:
            return None
        d_new, _pdf_c, _w_c, is_delta = res
        if is_delta:
            return res
        f_mix, pdf_mix = self.bsdf_eval_pdf(tri, n, d_in_ray, d_new, uv)
        if pdf_mix <= 0.0:
            return None
        return d_new, pdf_mix, f_mix / pdf_mix, False

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
            weight = self.a.ks[tri].copy()
        else:
            scale = -inv_eta if cos_t < 0.0 else -eta
            wo = np.array([scale * wi[0], scale * wi[1], cos_t])
            factor = inv_eta if cos_t < 0.0 else eta
            weight = self.kt[tri] * (factor * factor)
        return wo[0] * t + wo[1] * b + wo[2] * ng, weight

    # ---------------------------------------------------------- transport
    def radiance(self, o, d, rng, k, prev_pdf, prev_delta, prev_nee):
        tri, t_hit, bu, bv = self.intersect(o, d)
        L = np.zeros(3)
        if tri < 0:
            # escaped: environment emission through the k+1-edge path
            if (self.env_color is not None or self.env_img is not None) \
                    and k >= self.min_depth:
                w = (1.0 if (prev_delta or not prev_nee)
                     else _balance(prev_pdf, self.env_pdf_sa(d)))
                L = L + self.env_radiance(d) * w
            return L
        p_hit = o + d * t_hit
        ng = self.ng[tri]
        if self.is_light[tri] and k >= self.min_depth \
                and -float(ng @ d) > 0.0:
            w = (1.0 if (prev_delta or not prev_nee)
                 else _balance(prev_pdf, self.light_pdf_sa(tri, o, p_hit,
                                                           d)))
            L = L + self.le[tri] * w
        can_expand = self.max_depth is None or k + 1 < self.max_depth
        if not can_expand:
            return L

        # glass keeps the UNFLIPPED geometric frame (wi.z sign = in/out)
        uv = self.uv_at(tri, bu, bv)
        is_glass = self.a.kind[tri] == 2
        smooth = self.smooth[tri]
        n = ng.copy()
        if not is_glass and not self.is_light[tri] and float(n @ d) > 0.0:
            n = -n

        if k + 1 >= self.min_depth and not smooth:
            ls = self.sample_light(p_hit, rng)
            if ls is not None:
                f, pdf_other = self.bsdf_eval_pdf(tri, n, d, ls["d"], uv)
                if float(np.max(f)) > 0.0:
                    p_shadow = self.offset(p_hit, ng, ls["d"])
                    vis = (not self.occluded_ray(p_shadow, ls["d"])
                           if ls["dist"] is None
                           else not self.occluded(p_shadow, ls["p_l"]))
                    if vis:
                        w = 1.0 if ls["is_delta"] else _balance(
                            ls["pdf_sa"], pdf_other)
                        L = L + f * ls["weight"] * w

        next_delta = False
        if is_glass:
            d_new, weight = self.glass_sample(tri, ng, d, rng)
            pdf_dir = 1.0
            next_delta = True
        else:
            res = self.bsdf_sample(tri, n, d, rng, uv)
            if res is None:
                return L
            d_new, pdf_dir, weight, next_delta = res
        if float(np.max(weight)) <= 0.0:
            return L
        o_new = self.offset(p_hit, ng, d_new)
        ln = self.radiance(o_new, d_new, rng, k + 1, pdf_dir, next_delta,
                           not smooth)
        return L + weight * ln

    # --------------------------------------------------------------- film
    def render_block(self, x0, y0, sx, sy, pass_):
        xe = min(x0 + sx, self.width)
        ye = min(y0 + sy, self.height)
        for y in range(y0, ye):
            for x in range(x0, xe):
                rng = pixel_rng(x, y, pass_, self.seed)
                o, d = self.camera_ray(x + rng(), y + rng())
                li = self.radiance(o, d, rng, 0, 1.0, True, False)
                idx = y * self.width + x
                if np.isfinite(li).all() and (li >= 0).all():
                    self.img[idx] += li
                    self.img2[idx] += li * li
                self.nb_samples[idx] += 1

    def run(self, passes: int, block: int = 16):
        for p in range(passes):
            for y0 in range(0, self.height, block):
                for x0 in range(0, self.width, block):
                    self.render_block(x0, y0, block, block, p)

    def mean_linear(self):
        ns = np.maximum(self.nb_samples, 1)[:, None]
        return (self.img / ns).reshape(self.height, self.width, 3)

    def var_of_mean(self):
        out = np.zeros_like(self.img)
        n = self.nb_samples
        m2 = n >= 2
        mean = self.img[m2] / n[m2, None]
        s2 = np.maximum(
            (self.img2[m2] - n[m2, None] * mean * mean)
            / (n[m2, None] - 1), 0.0)
        out[m2] = s2 / n[m2, None]
        return out.reshape(self.height, self.width, 3)


def _balance(pdf_a, pdf_b):
    return 0.0 if pdf_a <= 0.0 else pdf_a / (pdf_a + pdf_b)
