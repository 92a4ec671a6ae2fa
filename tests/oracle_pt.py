"""Independent scalar CPU path-tracing oracle (VERDICT r3 item 4).

A deliberately slow, simple, per-pixel *recursive* path tracer written in
plain numpy from the algorithm specification (reference
/root/reference/src/integrators/explicit/path.rs:198-237: unidirectional
path tracing with next-event estimation and balance-heuristic MIS;
/root/reference/src/volume.rs:95-150: spectral channel-select free-flight
sampling in a homogeneous medium). It intentionally imports NONE of
rustlight_tpu's transport code — intersection (Moller-Trumbore here vs
Baldwin-Weber on the wavefront), sampling warps, BSDF evaluation, NEE,
MIS and medium sampling are all re-derived independently, in float64.
The only shared inputs are scene DATA: triangle vertices, material
descriptions and the camera matrices. This is the same dual-implementation
discipline the repo uses for the PIZ codec: two codebases written from the
same spec cross-validating each other statistically, standing in for the
un-buildable Rust reference (no rustc/cargo/egress in this image).

Scope: diffuse, phong and glass materials (phong: the Modified-Phong
lobe mix of /root/reference/src/bsdfs/phong.rs:13-136 — cosine-diffuse +
exponent lobe around the mirror direction, lobe selection by
weight_specular, full MIS-compatible mixture pdf; glass: the smooth
dielectric delta interface of glass.rs:75-124 with Mitsuba-convention
Fresnel, NEE skipped at delta vertices and radiance-transport eta^2
scaling), triangle area lights, optional homogeneous isotropic medium. Enough to cross-check the estimators that
carry the regression suite (path with NEE+MIS at any max_depth, direct
lighting as max_depth=2, volumetric path tracing, and the veach_mis
glossy-MIS configuration). Raises loudly on anything else.
"""
from __future__ import annotations

import math

import numpy as np

_EPS_REL = 2e-5     # self-intersection offsets, relative to |p|
_EPS_ABS = 1e-4


class OracleScene:
    """Flatten a host rustlight_tpu Scene into plain float64 numpy arrays."""

    def __init__(self, scene):
        # contract: raise loudly on anything outside oracle scope — a
        # silently-ignored emitter would z-test the renderer against a
        # reference that omits those light paths
        if scene.env_constant is not None or scene.env_image is not None:
            raise NotImplementedError("oracle: no environment light")
        if scene.point_lights or scene.directional_lights \
                or scene.point_normal_lights:
            raise NotImplementedError(
                "oracle: triangle area lights only")
        v0, e1, e2, kd, le, two_sided = [], [], [], [], [], []
        kind, ks, kt, eta, expo, wspec = [], [], [], [], [], []
        em_tri, em_weight = [], []
        mats = scene.materials or []
        for mesh in scene.meshes:
            mat = mats[mesh.material]
            if int(mat.kind) not in (0, 1, 2):   # DIFFUSE, PHONG, GLASS
                raise NotImplementedError(
                    "oracle supports diffuse/phong/glass materials only")
            if int(getattr(mat, "tex_kind", 0)) != 0:
                raise NotImplementedError("oracle: constant albedo only")
            if mesh.emission_kind != 0:
                raise NotImplementedError("oracle: constant emission only")
            verts = np.asarray(mesh.vertices, np.float64)
            areas = mesh.triangle_areas().astype(np.float64)
            flux_scalar = float(np.max(mesh.flux()))
            total = max(float(areas.sum()), 1e-30)
            for k, (i0, i1, i2) in enumerate(np.asarray(mesh.indices)):
                t = len(v0)
                v0.append(verts[i0])
                e1.append(verts[i1] - verts[i0])
                e2.append(verts[i2] - verts[i0])
                kd.append(np.asarray(mat.kd, np.float64))
                kind.append(int(mat.kind))
                ks.append(np.asarray(mat.ks, np.float64))
                kt.append(np.asarray(mat.kt, np.float64))
                eta.append(float(mat.eta))
                expo.append(float(mat.exponent))
                wspec.append(float(mat.weight_specular))
                le.append(np.asarray(mesh.emission, np.float64))
                two_sided.append(True)   # diffuse and phong are two-sided
                if mesh.is_light:
                    em_tri.append(t)
                    # selection weight: channel-max mesh flux x in-mesh area
                    # fraction (scene/emitters.py:136-146)
                    em_weight.append(flux_scalar * areas[k] / total)
        self.v0 = np.asarray(v0)
        self.e1 = np.asarray(e1)
        self.e2 = np.asarray(e2)
        nraw = np.cross(self.e1, self.e2)
        nl = np.linalg.norm(nraw, axis=-1, keepdims=True)
        self.ng = nraw / np.maximum(nl, 1e-30)
        self.area = 0.5 * nl[:, 0]
        self.kd = np.asarray(kd)
        self.kind = np.asarray(kind, np.int64)
        self.ks = np.asarray(ks)
        self.kt = np.asarray(kt)
        self.eta_m = np.asarray(eta)
        self.expo = np.asarray(expo)
        self.wspec = np.asarray(wspec)
        self.le = np.asarray(le)
        self.is_light = np.linalg.norm(self.le, axis=-1) > 0.0
        self.em_tri = np.asarray(em_tri, np.int64)
        w = np.asarray(em_weight, np.float64)
        self.em_prob = w / w.sum()
        # solid-angle-independent part of the NEE pdf per emissive tri:
        # selection pdf / triangle area (area-measure pdf of the sample)
        self.pdf_area = np.zeros(len(self.v0))
        self.pdf_area[self.em_tri] = self.em_prob / self.area[self.em_tri]

        cam = scene.camera
        self.cam_s2c = np.asarray(cam.sample_to_camera, np.float64)
        self.cam_to_world = np.asarray(cam.to_world, np.float64)
        self.cam_w = cam.width
        self.cam_h = cam.height

        self.sigma_t = self.sigma_s = None
        if scene.volume is not None:
            if abs(float(scene.volume.phase_g)) > 1e-9:
                raise NotImplementedError("oracle: isotropic phase only")
            self.sigma_s = np.asarray(scene.volume.sigma_s, np.float64)
            self.sigma_t = self.sigma_s + np.asarray(scene.volume.sigma_a,
                                                     np.float64)

    # ------------------------------------------------------------ ray casts
    def intersect(self, o, d, tmax=np.inf):
        """Closest hit by Moller-Trumbore over all triangles.

        Returns (tri, t, p) or (None, tmax-ish, None)."""
        pvec = np.cross(d, self.e2)
        det = np.einsum("ij,ij->i", self.e1, pvec)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvec = o - self.v0
        u = np.einsum("ij,ij->i", tvec, pvec) * inv
        qvec = np.cross(tvec, self.e1)
        v = (qvec @ d) * inv
        t = np.einsum("ij,ij->i", self.e2, qvec) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > _EPS_ABS) \
            & (t < tmax)
        if not hit.any():
            return None, np.inf, None
        t = np.where(hit, t, np.inf)
        tri = int(np.argmin(t))
        return tri, float(t[tri]), o + d * t[tri]

    def occluded(self, p0, p1):
        d = p1 - p0
        dist = float(np.linalg.norm(d))
        if dist <= 0.0:
            return True
        d = d / dist
        tri, t, _ = self.intersect(p0, d, tmax=dist * (1.0 - 1e-4))
        return tri is not None

    def _offset(self, p, n, d):
        eps = _EPS_ABS + _EPS_REL * float(np.max(np.abs(p)))
        sign = 1.0 if float(n @ d) >= 0.0 else -1.0
        return p + n * (eps * sign)

    # ------------------------------------------------------------- sampling
    def _sample_light(self, p_ref, rng):
        """One NEE sample: (dir, dist, weight=Le*G/pdf_area, pdf_sa, p_lt)."""
        i = rng.choice(len(self.em_tri), p=self.em_prob)
        tri = int(self.em_tri[i])
        su = math.sqrt(rng.random())
        b1, b2 = 1.0 - su, rng.random() * su
        p_l = self.v0[tri] + b1 * self.e1[tri] + b2 * self.e2[tri]
        delta = p_l - p_ref
        dist = float(np.linalg.norm(delta))
        if dist <= 0.0:
            return None
        d = delta / dist
        cos_l = float(self.ng[tri] @ (-d))
        if cos_l <= 0.0:
            return None
        g = cos_l / (dist * dist)
        pdf_area = self.pdf_area[tri]
        weight = self.le[tri] * (g / pdf_area)
        pdf_sa = pdf_area * dist * dist / cos_l
        return d, dist, weight, pdf_sa, p_l

    def _light_pdf_sa(self, tri, p_ref, p_hit, n_hit, d):
        """Solid-angle pdf the NEE strategy would have for this hit."""
        cos_l = float(n_hit @ (-d))
        if cos_l <= 0.0 or not self.is_light[tri]:
            return 0.0
        dist2 = float(np.sum((p_hit - p_ref) ** 2))
        return self.pdf_area[tri] * dist2 / cos_l

    @staticmethod
    def _onb(n):
        """ONB about n (Gram-Schmidt off the smallest component)."""
        a = np.zeros(3)
        a[int(np.argmin(np.abs(n)))] = 1.0
        t = np.cross(n, a)
        t /= np.linalg.norm(t)
        return t, np.cross(n, t)

    @staticmethod
    def _cosine_hemisphere_uv(n, u1, u2):
        """Cosine-weighted direction about n from explicit uniforms."""
        r = math.sqrt(u1)
        phi = 2.0 * math.pi * u2
        x, y = r * math.cos(phi), r * math.sin(phi)
        z = math.sqrt(max(1.0 - u1, 0.0))
        t, b = OracleScene._onb(n)
        return x * t + y * b + z * n, z / math.pi

    @staticmethod
    def _cosine_hemisphere(n, rng):
        """Cosine-weighted direction about n; returns (d_world, pdf_sa)."""
        return OracleScene._cosine_hemisphere_uv(n, rng.random(),
                                                 rng.random())

    # ------------------------------------------------------------- BSDFs
    def _bsdf_eval_pdf(self, tri, n, d_in_ray, d_out):
        """(f including the outgoing cosine, mixture sampling pdf) for
        world directions at a surface vertex; d_in_ray is the incoming RAY
        direction (pointing at the surface), n the (flipped) shading-side
        normal. Diffuse: kd cos/pi. Phong (phong.rs:66-121): diffuse term
        kd cos/pi + specular lobe ks alpha^e (e+2)/2pi about the mirror
        direction, pdf = ws alpha^e (e+1)/2pi + (1-ws) cos/pi."""
        cos_o = float(n @ d_out)
        if cos_o <= 0.0:
            return np.zeros(3), 0.0
        if self.kind[tri] == 0:
            return self.kd[tri] / math.pi * cos_o, cos_o / math.pi
        wi = -np.asarray(d_in_ray)           # toward viewer; wi.z>0 by flip
        refl = 2.0 * float(n @ wi) * n - wi  # mirror of wi about n
        alpha = float(refl @ d_out)
        e, ws = self.expo[tri], self.wspec[tri]
        spec = np.zeros(3)
        pdf_s = 0.0
        if alpha > 0.0:
            ae = alpha ** e
            spec = self.ks[tri] * (ae * (e + 2.0) / (2.0 * math.pi))
            pdf_s = ws * ae * (e + 1.0) / (2.0 * math.pi)
        f = spec + self.kd[tri] * cos_o / math.pi
        return f, pdf_s + (1.0 - ws) * cos_o / math.pi

    @staticmethod
    def _fresnel_dielectric(cos_i, eta):
        """(unpolarized reflectance, signed cos_theta_t) — the Mitsuba-
        convention dielectric Fresnel of bsdfs/utils.rs:99-130: cos_i is
        SIGNED (positive = outside), cos_theta_t's sign encodes which way
        the transmitted ray crosses; (1, 0) flags total internal
        reflection."""
        if eta == 1.0:
            return 0.0, -cos_i
        scale = (1.0 / eta) if cos_i > 0.0 else eta
        cos_t_sqr = 1.0 - (1.0 - cos_i * cos_i) * (scale * scale)
        if cos_t_sqr <= 0.0:
            return 1.0, 0.0
        ci = abs(cos_i)
        ct = math.sqrt(cos_t_sqr)
        rs = (ci - eta * ct) / (ci + eta * ct)
        rp = (eta * ci - ct) / (eta * ci + ct)
        ct = -ct if cos_i > 0.0 else ct
        return 0.5 * (rs * rs + rp * rp), ct

    def _glass_sample(self, tri, ng, d_in_ray, rng):
        """Smooth-dielectric delta interface (glass.rs:75-124): Fresnel-
        selected reflect/refract in the UNFLIPPED geometric frame (wi.z<0
        = hitting from inside), transmission weight scaled by the radiance
        solid-angle-compression factor^2. Returns (d_world, weight)."""
        t, b = self._onb(ng)
        wi = np.array([-float(d_in_ray @ t), -float(d_in_ray @ b),
                       -float(d_in_ray @ ng)])
        eta = self.eta_m[tri]
        inv_eta = 1.0 / eta
        fresnel, cos_t = self._fresnel_dielectric(wi[2], eta)
        if rng.random() <= fresnel:
            wo = np.array([-wi[0], -wi[1], wi[2]])
            weight = self.ks[tri].copy()
        else:
            scale = -inv_eta if cos_t < 0.0 else -eta
            wo = np.array([scale * wi[0], scale * wi[1], cos_t])
            factor = inv_eta if cos_t < 0.0 else eta
            weight = self.kt[tri] * (factor * factor)
        d_world = wo[0] * t + wo[1] * b + wo[2] * ng
        return d_world, weight

    def _bsdf_sample(self, tri, n, d_in_ray, rng):
        """One BSDF direction sample: (d_world, pdf_sa, weight=f/pdf) or
        None (killed lane). Phong lobe selection by weight_specular with
        remainder reuse (phong.rs:14-63); specular samples falling under
        the surface kill the path like the reference's None return."""
        if self.kind[tri] == 0:
            d_new, pdf = self._cosine_hemisphere(n, rng)
            if pdf <= 0.0:
                return None
            return d_new, pdf, self.kd[tri].copy()
        e, ws = self.expo[tri], self.wspec[tri]
        u, v = rng.random(), rng.random()
        if u < ws:
            u = u / ws
            wi = -np.asarray(d_in_ray)
            refl = 2.0 * float(n @ wi) * n - wi
            cos_a = v ** (1.0 / (e + 1.0))
            sin_a = math.sqrt(max(1.0 - cos_a * cos_a, 0.0))
            phi = 2.0 * math.pi * u
            t, b = self._onb(refl)
            d_new = (sin_a * math.cos(phi)) * t \
                + (sin_a * math.sin(phi)) * b + cos_a * refl
            if float(n @ d_new) <= 0.0:
                return None
        else:
            u = (u - ws) / (1.0 - ws)
            d_new, _ = self._cosine_hemisphere_uv(n, u, v)
        f, pdf = self._bsdf_eval_pdf(tri, n, d_in_ray, d_new)
        if pdf <= 0.0:
            return None
        return d_new, pdf, f / pdf

    @staticmethod
    def _uniform_sphere(rng):
        z = 1.0 - 2.0 * rng.random()
        r = math.sqrt(max(1.0 - z * z, 0.0))
        phi = 2.0 * math.pi * rng.random()
        return np.asarray([r * math.cos(phi), r * math.sin(phi), z])

    # ------------------------------------------------------------ transport
    @staticmethod
    def _balance(pdf_a, pdf_b):
        if pdf_a <= 0.0:
            return 0.0
        return pdf_a / (pdf_a + pdf_b)

    def radiance(self, o, d, rng, k=0, prev_pdf=1.0, prev_delta=True,
                 prev_nee=False, min_depth=0, max_depth=5, mis=True,
                 nee=True):
        """Recursive radiance estimate along (o, d), k edges completed."""
        tri, t_hit, p_hit = self.intersect(o, d)
        L = np.zeros(3)

        # ---- medium free flight (spectral channel selection, volume.rs)
        thr_med = np.ones(3)
        scattered = False
        if self.sigma_t is not None:
            u = rng.random()
            comp = min(int(u * 3.0), 2)
            u2 = u * 3.0 - comp
            s_c = max(self.sigma_t[comp], 1e-20)
            t_med = -math.log(max(1.0 - u2, 1e-20)) / s_c
            tfar = t_hit if tri is not None else 1e8
            scattered = t_med < tfar
            t_min = min(t_med, tfar)
            tr = np.exp(-t_min * self.sigma_t)
            if scattered:
                pdf = float(np.mean(self.sigma_t * tr))
                thr_med = self.sigma_s * tr / max(pdf, 1e-30)
                p_v = o + d * t_min
            else:
                pdf = float(np.mean(tr))
                thr_med = tr / max(pdf, 1e-30)

        if not scattered:
            if tri is None:
                return L          # no envmap in oracle scope
            p_v = p_hit
            # emission through the directional edge (k+1 edges)
            if self.is_light[tri] and k >= min_depth \
                    and float(self.ng[tri] @ (-d)) > 0.0:
                if prev_delta or not prev_nee or not mis:
                    w_hit = 1.0
                else:
                    pl = self._light_pdf_sa(tri, o, p_hit, self.ng[tri], d)
                    w_hit = self._balance(prev_pdf, pl)
                L = L + thr_med * self.le[tri] * w_hit

        can_expand = (max_depth is None) or (k + 1 < max_depth)
        if not can_expand:
            return L

        is_delta = (not scattered) and self.kind[tri] == 2   # glass
        if scattered:
            f_const = 1.0 / (4.0 * math.pi)   # isotropic phase (value==pdf)
        else:
            n = self.ng[tri].copy()
            # two-sided: flip toward the incoming side (non-lights only;
            # glass keeps the unflipped geometric frame — wi.z's sign
            # encodes inside/outside)
            if not is_delta and not self.is_light[tri] \
                    and float(n @ d) > 0.0:
                n = -n

        # ---- NEE (light strategy), path of k+2 edges; a delta interface
        # has zero value on any sampled direction, so NEE is skipped there
        # (LightSamplingStrategy evaluates f=0 for BSDFType::DELTA)
        if nee and (k + 1) >= min_depth and not is_delta:
            ls = self._sample_light(p_v, rng)
            if ls is not None:
                d_l, dist_l, w_l, pdf_l, p_l = ls
                if scattered:
                    f = np.full(3, f_const)
                    pdf_other = f_const
                    p_shadow = p_v
                else:
                    f, pdf_other = self._bsdf_eval_pdf(tri, n, d, d_l)
                    p_shadow = self._offset(p_hit, self.ng[tri], d_l)
                if float(np.max(f)) > 0.0 and not self.occluded(p_shadow,
                                                                p_l):
                    tr_sh = (np.exp(-self.sigma_t * dist_l)
                             if self.sigma_t is not None else 1.0)
                    w_nee = (self._balance(pdf_l, pdf_other)
                             if mis else 1.0)
                    L = L + thr_med * f * tr_sh * w_l * w_nee

        # ---- directional bounce (BSDF at surfaces, phase in the medium)
        if scattered:
            d_new = self._uniform_sphere(rng)
            weight = np.ones(3)          # perfect IS: value/pdf = 1
            pdf_dir = f_const
            o_new = p_v
        elif is_delta:
            d_new, weight = self._glass_sample(tri, self.ng[tri], d, rng)
            pdf_dir = 1.0                # discrete pdf; MIS never uses it
            o_new = self._offset(p_hit, self.ng[tri], d_new)
        else:
            res = self._bsdf_sample(tri, n, d, rng)
            if res is None:
                return L
            d_new, pdf_dir, weight = res
            o_new = self._offset(p_hit, self.ng[tri], d_new)
        if float(np.max(weight)) <= 0.0:
            return L

        L_next = self.radiance(o_new, d_new, rng, k=k + 1, prev_pdf=pdf_dir,
                               prev_delta=is_delta, prev_nee=nee,
                               min_depth=min_depth, max_depth=max_depth,
                               mis=mis, nee=nee)
        return L + thr_med * weight * L_next

    # --------------------------------------------------------------- camera
    def camera_ray(self, px, py):
        s = np.asarray([px / self.cam_w, py / self.cam_h, 0.0, 1.0])
        q = self.cam_s2c @ s
        d_cam = q[:3] / q[3]
        d_cam /= np.linalg.norm(d_cam)
        d = self.cam_to_world[:3, :3] @ d_cam
        o = self.cam_to_world[:3, 3]
        return o.copy(), d

    def render(self, width, height, spp, seed=0, max_depth=5, min_depth=0,
               mis=True, nee=True):
        """Render; returns (mean [h,w,3], var-of-sample-mean [h,w,3])."""
        rng = np.random.default_rng(seed)
        mean = np.zeros((height, width, 3))
        m2 = np.zeros((height, width, 3))
        for y in range(height):
            for x in range(width):
                for s in range(spp):
                    o, d = self.camera_ray(x + rng.random(),
                                           y + rng.random())
                    li = self.radiance(o, d, rng, max_depth=max_depth,
                                       min_depth=min_depth, mis=mis, nee=nee)
                    delta = li - mean[y, x]
                    mean[y, x] += delta / (s + 1)
                    m2[y, x] += delta * (li - mean[y, x])
        var = m2 / max(spp - 1, 1)       # per-sample variance
        return mean, var / spp           # variance OF the pixel mean
