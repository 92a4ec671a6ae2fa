"""Closed-form parity oracles.

The rustlight CPU reference cannot be built in this environment (no
rustc/cargo, no network egress — see STATUS.md), so cross-renderer RMSE is
anchored by ANALYTIC scenes with exact radiance instead: any shared bias in
the scene model (emission convention, falloff, cosine terms, transmittance)
fails these independently of the renderer's own sampling code.
"""
import numpy as np
import jax.numpy as jnp

from rustlight_tpu import bsdfs
from rustlight_tpu.scene import Scene, make_camera, look_at, make_quad
from rustlight_tpu.integrators import (
    IntegratorDirect, IntegratorPathTracing, render,
)


class TestPointLightPlane:
    """Diffuse floor + point light: L(p) = albedo/pi * I * cos(theta) / d^2
    exactly (delta light -> zero-variance NEE). Checked PER PIXEL."""

    def test_per_pixel_closed_form(self):
        albedo, inten = 0.6, 20.0
        lp = np.array([0.0, 2.0, 0.0], np.float32)
        sc = Scene()
        m = sc.add_material(bsdfs.diffuse((albedo,) * 3))
        sc.add_mesh(make_quad((-20, 0, -20), (20, 0, -20), (20, 0, 20),
                              (-20, 0, 20), material=m))
        sc.point_lights.append((lp, (inten,) * 3))
        W = H = 32
        sc.camera = make_camera(W, H, fov=60.0,
                                to_world=look_at((0, 3, -4), (0, 0, 0),
                                                 (0, 1, 0)))
        sd = sc.compile()
        img = render(sd, IntegratorDirect(nb_bsdf_samples=0,
                                          nb_light_samples=1),
                     spp=64, seed=0)["primal"][..., 0]

        # expected image: hit points via the camera mapping, transport in
        # closed form (cos/d^2 falloff, albedo/pi BRDF)
        from rustlight_tpu.scene.camera import generate_rays
        ys, xs = np.mgrid[0:H, 0:W]
        pix = jnp.asarray(
            np.stack([xs + 0.5, ys + 0.5], -1).reshape(-1, 2), jnp.float32)
        o, d = generate_rays(sd.camera, pix)
        o, d = np.asarray(o), np.asarray(d)
        t = -o[:, 1] / d[:, 1]
        p = o + t[:, None] * d
        dv = lp[None] - p
        dist2 = (dv ** 2).sum(-1)
        cos = np.maximum(dv[:, 1] / np.sqrt(dist2), 0.0)
        expected = (albedo / np.pi) * inten * cos / dist2
        expected = np.where(t > 0, expected, 0.0).reshape(H, W)

        # interior pixels (jitter blurs nothing here: the floor fills the
        # view and the integrand is smooth)
        err = np.abs(img - expected) / np.maximum(expected, 1e-6)
        assert np.median(err) < 0.02, float(np.median(err))
        assert err[4:-4, 4:-4].max() < 0.08, float(err[4:-4, 4:-4].max())

    def test_direct_matches_path(self):
        """Same scene through the path tracer's NEE (different code path)."""
        albedo, inten = 0.6, 20.0
        sc = Scene()
        m = sc.add_material(bsdfs.diffuse((albedo,) * 3))
        sc.add_mesh(make_quad((-20, 0, -20), (20, 0, -20), (20, 0, 20),
                              (-20, 0, 20), material=m))
        sc.point_lights.append((np.array([0., 2., 0.], np.float32),
                                (inten,) * 3))
        sc.camera = make_camera(24, 24, fov=60.0,
                                to_world=look_at((0, 3, -4), (0, 0, 0),
                                                 (0, 1, 0)))
        sd = sc.compile()
        a = render(sd, IntegratorDirect(nb_bsdf_samples=0), spp=16,
                   seed=0)["primal"]
        b = render(sd, IntegratorPathTracing(max_depth=2, hard_cap=2),
                   spp=16, seed=1)["primal"]
        # depth-2 path adds one extra bounce of indirect; it must only ADD
        assert (b.mean() >= a.mean() * 0.99)
        c = render(sd, IntegratorPathTracing(max_depth=2, hard_cap=2,
                                             strategy="emitter"),
                   spp=16, seed=2)["primal"]
        # per-pixel values carry sub-pixel jitter noise; the estimators are
        # both zero-variance in the light term, so region means must agree
        np.testing.assert_allclose(a[8:16, 8:16, 0].mean(),
                                   c[8:16, 8:16, 0].mean(), rtol=0.02)


class TestEmissionConvention:
    """An emissive quad viewed head-on reads EXACTLY Le per pixel,
    independent of distance (radiance invariance — the emission-convention
    anchor the self-consistency matrix cannot provide)."""

    def test_radiance_invariant_with_distance(self):
        le = (3.0, 5.0, 7.0)
        for dist in (1.0, 3.0):
            sc = Scene()
            m = sc.add_material(bsdfs.diffuse((0.0,) * 3))
            sc.add_mesh(make_quad((-10, -10, 0), (-10, 10, 0), (10, 10, 0),
                                  (10, -10, 0), material=m, emission=le))
            sc.camera = make_camera(16, 16, fov=40.0,
                                    to_world=look_at((0, 0, -dist), (0, 0, 0),
                                                     (0, 1, 0)))
            sd = sc.compile()
            img = render(sd, IntegratorPathTracing(max_depth=1, hard_cap=1),
                         spp=4, seed=0)["primal"]
            np.testing.assert_allclose(
                img, np.broadcast_to(np.asarray(le, np.float32), img.shape),
                rtol=1e-5)


class TestTransmittanceExact:
    """Emissive wall behind a homogeneous medium: pixel = Le * exp(-sigma_t
    * depth) in expectation (volume.rs:137-141 analytic transmittance)."""

    def test_beer_lambert(self):
        from rustlight_tpu.scene import make_volume
        le, depth = 4.0, 2.5
        sig_s, sig_a = 0.15, 0.25
        sc = Scene()
        m = sc.add_material(bsdfs.diffuse((0.0,) * 3))
        sc.add_mesh(make_quad((-30, -30, depth), (-30, 30, depth),
                              (30, 30, depth), (30, -30, depth),
                              material=m, emission=(le,) * 3))
        sc.volume = make_volume(sigma_s=(sig_s,) * 3, sigma_a=(sig_a,) * 3)
        sc.camera = make_camera(16, 16, fov=30.0,
                                to_world=look_at((0, 0, 0), (0, 0, 1),
                                                 (0, 1, 0)))
        sd = sc.compile()
        # single_scattering off; scattered-in light is dark (black walls),
        # so the direct term dominates: Le * exp(-sigma_t * ~depth)
        img = render(sd, IntegratorPathTracing(max_depth=1, hard_cap=1),
                     spp=512, seed=0)["primal"]
        got = float(img[6:10, 6:10, 0].mean())
        want = le * np.exp(-(sig_s + sig_a) * depth)
        assert abs(got - want) / want < 0.03, (got, want)


class TestEnvmapImportanceSampling:
    """Estimator identities for the textured-envmap 2D CDF sampler
    (reference EnvironmentLight new_texture/sample_direction,
    emitter.rs:342-424): for samples d ~ pdf, mean(1/pdf)/4pi -> 1 and
    mean(L/pdf) -> integral of L over the sphere (quadrature oracle)."""

    def test_inverse_pdf_identities(self):
        from pathlib import Path
        import numpy as np
        import jax
        import jax.numpy as jnp
        from rustlight_tpu.scene.loaders.mitsuba import load_mitsuba
        from rustlight_tpu.scene.emitters import _sample_env_direction
        root = Path(__file__).parent.parent
        sd = load_mitsuba(root / "examples" / "envglass.xml").compile()
        em = sd.emitters
        assert em.env_textured
        n = 1 << 18
        uv = jax.random.uniform(jax.random.PRNGKey(9), (n, 2))
        d, color, pdf = _sample_env_direction(em, uv)
        pdf = np.asarray(pdf)
        ok = pdf > 0
        assert ok.mean() > 0.999
        sphere = float((1.0 / pdf[ok]).mean() * ok.mean()) / (4 * np.pi)
        assert abs(sphere - 1.0) < 0.02, sphere
        # energy: MC with IS vs direct quadrature of the map
        lum = np.asarray(color)[..., :3].mean(-1)
        mc = float((lum[ok] / pdf[ok]).mean() * ok.mean())
        img = np.asarray(em.env_img)[..., :3].mean(-1)
        h, w = img.shape
        th = (np.arange(h) + 0.5) / h * np.pi
        quad = float((img * np.sin(th)[:, None]).sum()
                     * (np.pi / h) * (2 * np.pi / w))
        assert abs(mc - quad) / quad < 0.05, (mc, quad)
