"""BSDF correctness: sample/pdf/eval consistency and energy checks.

Oracles (SURVEY.md §4): pdf integrates to 1 over the hemisphere, sampled
weight == eval/pdf, Monte Carlo white-furnace energy <= 1, Fresnel sanity.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustlight_tpu import bsdfs
from rustlight_tpu.bsdfs import (
    build_material_table, bsdf_eval, bsdf_pdf, bsdf_sample,
    fresnel_dielectric, fresnel_conductor,
)
from rustlight_tpu.utils import warps

N = 50_000


def _table():
    mats = [
        bsdfs.diffuse(kd=(0.7, 0.5, 0.3)),                       # 0
        bsdfs.phong(kd=(0.3, 0.3, 0.3), ks=(0.4, 0.4, 0.4), exponent=50.0),  # 1
        bsdfs.glass(),                                           # 2
        bsdfs.metal(alpha=0.0),                                  # 3 smooth
        bsdfs.metal(alpha=0.2, dist_ggx=True),                   # 4 rough ggx
        bsdfs.substrate(kd=(0.5, 0.5, 0.5), ks=(0.04, 0.04, 0.04), alpha=0.15),  # 5
        bsdfs.metal(alpha=0.3, dist_ggx=False),                  # 6 rough beckmann
        bsdfs.blend(0, 1, 0.3),                                  # 7
    ]
    return build_material_table(mats)


TABLE = _table()


def _wi(n, z=0.6):
    wi = jnp.tile(jnp.asarray([[np.sqrt(1 - z * z), 0.0, z]], jnp.float32), (n, 1))
    return wi


def _ids(mid, n):
    return jnp.full((n,), mid, jnp.int32)


def _uv(n):
    return jnp.zeros((n, 2), jnp.float32)


@pytest.mark.parametrize("mid", [0, 1, 4, 5, 6, 7])
class TestSolidAngleBsdfs:
    def test_sample_weight_matches_eval_over_pdf(self, mid):
        u = jax.random.uniform(jax.random.PRNGKey(0), (N, 2))
        wi = _wi(N)
        s = bsdf_sample(TABLE, _ids(mid, N), _uv(N), wi, u)
        sa = np.asarray(s.valid) & ~np.asarray(s.is_delta)
        assert sa.mean() > 0.4
        f = np.asarray(bsdf_eval(TABLE, _ids(mid, N), _uv(N), wi, s.wo))
        pdf = np.asarray(bsdf_pdf(TABLE, _ids(mid, N), _uv(N), wi, s.wo))
        w = np.asarray(s.weight)
        expect = f / np.maximum(pdf, 1e-20)[:, None]
        np.testing.assert_allclose(w[sa], expect[sa], rtol=2e-3, atol=1e-4)
        # reported pdf for solid-angle samples matches pdf()
        np.testing.assert_allclose(np.asarray(s.pdf)[sa], pdf[sa], rtol=2e-3, atol=1e-5)

    def test_pdf_integrates_to_one_or_less(self, mid):
        # MC integrate pdf over uniform hemisphere: should be <= 1 (some mass
        # may be rejected below the horizon for glossy lobes)
        u = jax.random.uniform(jax.random.PRNGKey(1), (N, 2))
        wo = warps.sample_uniform_hemisphere(u)
        wi = _wi(N)
        pdf = np.asarray(bsdf_pdf(TABLE, _ids(mid, N), _uv(N), wi, wo))
        est = pdf.mean() * 2 * np.pi
        assert 0.5 < est <= 1.05, est

    def test_energy_conservation(self, mid):
        u = jax.random.uniform(jax.random.PRNGKey(2), (N, 2))
        wi = _wi(N)
        s = bsdf_sample(TABLE, _ids(mid, N), _uv(N), wi, u)
        w = np.asarray(s.weight)
        valid = np.asarray(s.valid)
        w = np.where(valid[:, None], w, 0.0)
        assert w.max() < 50.0
        # mean weight approximates albedo <= 1
        assert (w.mean(0) <= 1.05).all(), w.mean(0)


class TestDiffuse:
    def test_exact_values(self):
        wi = _wi(4)
        wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (4, 1))
        f = np.asarray(bsdf_eval(TABLE, _ids(0, 4), _uv(4), wi, wo))
        np.testing.assert_allclose(f, np.tile(np.array([0.7, 0.5, 0.3]) / np.pi, (4, 1)), rtol=1e-5)
        pdf = np.asarray(bsdf_pdf(TABLE, _ids(0, 4), _uv(4), wi, wo))
        np.testing.assert_allclose(pdf, 1.0 / np.pi, rtol=1e-5)

    def test_backface_zero(self):
        wi = -_wi(4)
        wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (4, 1))
        assert np.asarray(bsdf_eval(TABLE, _ids(0, 4), _uv(4), wi, wo)).max() == 0.0


class TestGlass:
    def test_delta_samples(self):
        u = jax.random.uniform(jax.random.PRNGKey(0), (N, 2))
        wi = _wi(N)
        s = bsdf_sample(TABLE, _ids(2, N), _uv(N), wi, u)
        assert np.asarray(s.is_delta).all()
        assert np.asarray(s.valid).all()
        wo = np.asarray(s.wo)
        refl = wo[:, 2] > 0
        # reflected rays mirror wi
        np.testing.assert_allclose(wo[refl, 2], 0.6, atol=1e-5)
        # refracted direction obeys Snell (sin_t = sin_i / eta)
        eta = 1.5046 / 1.000277
        sin_t = np.sqrt(wo[~refl, 0] ** 2 + wo[~refl, 1] ** 2)
        np.testing.assert_allclose(sin_t, 0.8 / eta, atol=1e-4)

    def test_unbiased_fresnel_split(self):
        u = jax.random.uniform(jax.random.PRNGKey(1), (N, 2))
        wi = _wi(N)
        s = bsdf_sample(TABLE, _ids(2, N), _uv(N), wi, u)
        frac_refl = (np.asarray(s.wo)[:, 2] > 0).mean()
        f_expect, _ = fresnel_dielectric(jnp.asarray(0.6), jnp.asarray(1.5046 / 1.000277))
        np.testing.assert_allclose(frac_refl, float(f_expect), atol=5e-3)

    def test_inside_outside_symmetric_traversal(self):
        # entering then exiting straight on returns the original direction
        wi = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        u = jnp.asarray([[0.99, 0.5]], jnp.float32)  # force transmission
        s = bsdf_sample(TABLE, _ids(2, 1), _uv(1), wi, u)
        np.testing.assert_allclose(np.asarray(s.wo), [[0, 0, -1]], atol=1e-5)


class TestFresnel:
    def test_dielectric_normal_incidence(self):
        f, _ = fresnel_dielectric(jnp.asarray(1.0), jnp.asarray(1.5))
        np.testing.assert_allclose(float(f), ((1.5 - 1) / (1.5 + 1)) ** 2, rtol=1e-5)

    def test_dielectric_tir(self):
        # from inside at grazing angle: total internal reflection
        f, ct = fresnel_dielectric(jnp.asarray(-0.2), jnp.asarray(1.5))
        assert float(f) == 1.0 and float(ct) == 0.0

    def test_conductor_normal_incidence(self):
        eta = np.array([0.2, 0.9, 1.1])
        k = np.array([3.9, 2.4, 2.1])
        f = np.asarray(fresnel_conductor(jnp.asarray([1.0]), jnp.asarray([eta]), jnp.asarray([k])))[0]
        expect = ((eta - 1) ** 2 + k ** 2) / ((eta + 1) ** 2 + k ** 2)
        np.testing.assert_allclose(f, expect, rtol=1e-4)


class TestSmoothMetal:
    def test_mirror(self):
        wi = _wi(8)
        u = jax.random.uniform(jax.random.PRNGKey(0), (8, 2))
        s = bsdf_sample(TABLE, _ids(3, 8), _uv(8), wi, u)
        assert np.asarray(s.is_delta).all()
        np.testing.assert_allclose(np.asarray(s.wo), np.asarray(bsdfs.kernels._reflect(wi)), atol=1e-6)
        assert (np.asarray(s.weight) <= 1.0 + 1e-5).all()


class TestBlend:
    def test_eval_is_convex_combination(self):
        wi = _wi(128)
        u = jax.random.uniform(jax.random.PRNGKey(3), (128, 2))
        wo = warps.cosine_sample_hemisphere(u)
        f_blend = np.asarray(bsdf_eval(TABLE, _ids(7, 128), _uv(128), wi, wo))
        f0 = np.asarray(bsdf_eval(TABLE, _ids(0, 128), _uv(128), wi, wo))
        f1 = np.asarray(bsdf_eval(TABLE, _ids(1, 128), _uv(128), wi, wo))
        np.testing.assert_allclose(f_blend, 0.3 * f0 + 0.7 * f1, rtol=1e-4, atol=1e-6)


class TestTextures:
    def test_checkerboard(self):
        mats = [bsdfs.MaterialDesc(kind=bsdfs.KIND_DIFFUSE, kd=(1, 0, 0),
                                   tex_kind=bsdfs.TEX_CHECKER, tex_c1=(0, 1, 0))]
        t = build_material_table(mats)
        uv = jnp.asarray([[0.1, 0.1], [0.6, 0.1], [0.6, 0.6], [0.1, 0.6]], jnp.float32)
        wi = _wi(4)
        wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (4, 1))
        f = np.asarray(bsdf_eval(t, _ids(0, 4), uv, wi, wo)) * np.pi
        # alternating pattern
        assert f[0].argmax() != f[1].argmax()
        assert f[0].argmax() == f[2].argmax()

    def test_bitmap(self):
        tex = np.zeros((1, 4, 4, 3), np.float32)
        tex[0, :, :2] = [1, 0, 0]
        tex[0, :, 2:] = [0, 0, 1]
        mats = [bsdfs.MaterialDesc(kind=bsdfs.KIND_DIFFUSE,
                                   tex_kind=bsdfs.TEX_BITMAP, tex_img=0)]
        t = build_material_table(mats, textures=tex)
        uv = jnp.asarray([[0.1, 0.5], [0.9, 0.5]], jnp.float32)
        wi = _wi(2)
        wo = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (2, 1))
        f = np.asarray(bsdf_eval(t, _ids(0, 2), uv, wi, wo)) * np.pi
        assert f[0].argmax() == 0 and f[1].argmax() == 2


class TestMicrofacetDistribution:
    """Direct D(m)-level oracles (reference distribution.rs:25-145): the
    sampled half-vector density must BE mf_pdf (chi-square GOF) and mf_pdf
    must integrate to 1 over the hemisphere."""

    @pytest.mark.parametrize("ggx", [False, True])
    @pytest.mark.parametrize("alpha", [0.1, 0.4])
    def test_pdf_normalizes(self, ggx, alpha):
        import numpy as np
        import jax.numpy as jnp
        from rustlight_tpu.bsdfs.microfacet import mf_pdf
        nt, np_ = 512, 256
        th = (np.arange(nt) + 0.5) / nt * (np.pi / 2)
        ph = (np.arange(np_) + 0.5) / np_ * (2 * np.pi)
        T, P = np.meshgrid(th, ph, indexing="ij")
        m = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                      np.cos(T)], -1).astype(np.float32)
        pdf = np.asarray(mf_pdf(jnp.bool_(ggx), jnp.float32(alpha),
                                jnp.asarray(m.reshape(-1, 3)))).reshape(nt, np_)
        integral = float((pdf * np.sin(T)).sum()
                         * (np.pi / 2 / nt) * (2 * np.pi / np_))
        assert abs(integral - 1.0) < 2e-2, integral

    @pytest.mark.parametrize("ggx", [False, True])
    @pytest.mark.parametrize("alpha", [0.1, 0.4])
    def test_sample_matches_pdf_chi_square(self, ggx, alpha):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from rustlight_tpu.bsdfs.microfacet import mf_pdf, mf_sample
        n = 1 << 18
        u = jax.random.uniform(jax.random.PRNGKey(3), (n, 2))
        m, _ = mf_sample(jnp.bool_(ggx), jnp.float32(alpha), u)
        cz = np.asarray(m[..., 2])
        assert (cz > 0).all()
        # theta-marginal chi-square over EQUIPROBABLE bins (uniform cos-theta
        # bins collapse to dof=0 for peaked distributions): bin edges are the
        # quantiles of the quadrature marginal, expected mass = n/nb per bin
        nb = 16
        nt, np_ = 8192, 64
        th = (np.arange(nt) + 0.5) / nt * (np.pi / 2)
        ph = (np.arange(np_) + 0.5) / np_ * (2 * np.pi)
        T, P = np.meshgrid(th, ph, indexing="ij")
        grid = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                         np.cos(T)], -1).astype(np.float32)
        pdf = np.asarray(mf_pdf(jnp.bool_(ggx), jnp.float32(alpha),
                                jnp.asarray(grid.reshape(-1, 3))))
        w = (pdf.reshape(nt, np_) * np.sin(T)).sum(1) * (np.pi / 2 / nt) \
            * (2 * np.pi / np_)
        cum = np.cumsum(w) / w.sum()
        q = np.arange(1, nb) / nb
        edges = np.concatenate([[0.0], np.interp(q, cum, th), [np.pi / 2]])
        theta_s = np.arccos(np.clip(cz, 0.0, 1.0))
        counts, _ = np.histogram(theta_s, bins=edges)
        expected = n / nb
        chi2 = ((counts - expected) ** 2 / expected).sum()
        dof = nb - 1
        # 99.9th percentile of chi2_15 is 37.7; allow quadrature-edge slack
        assert chi2 < 60.0, (chi2, dof, counts)
