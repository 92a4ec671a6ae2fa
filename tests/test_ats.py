"""ATS light-BVH tests: build, sample/pdf consistency, render parity."""
import jax
import jax.numpy as jnp
import numpy as np

from rustlight_tpu import bsdfs
from rustlight_tpu.models import cornell_box
from rustlight_tpu.scene import Scene, make_camera, look_at, make_quad
from rustlight_tpu.scene.ats import ats_sample, ats_pdf
from rustlight_tpu.integrators import IntegratorPathTracing, render


def _two_light_scene():
    sc = Scene()
    m = sc.add_material(bsdfs.diffuse((0.7, 0.7, 0.7)))
    sc.add_mesh(make_quad((-10, 0, -10), (10, 0, -10), (10, 0, 10), (-10, 0, 10),
                          material=m))
    # bright light near origin, dim light far away (normals face down)
    sc.add_mesh(make_quad((-1, 4, -1), (1, 4, -1), (1, 4, 1), (-1, 4, 1),
                          material=m, emission=(50, 50, 50)))
    sc.add_mesh(make_quad((7, 4, -1), (9, 4, -1), (9, 4, 1), (7, 4, 1),
                          material=m, emission=(1, 1, 1)))
    sc.camera = make_camera(24, 24, fov=60.0,
                            to_world=look_at((0, 3, -8), (0, 1, 0), (0, 1, 0)))
    return sc


class TestATS:
    def test_sample_pdf_consistency(self):
        sd = _two_light_scene().compile(use_ats=True)
        n_lanes = 4096
        p = jnp.tile(jnp.asarray([[0.0, 0.5, 0.0]]), (n_lanes, 1))
        nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n_lanes, 1))
        u = jax.random.uniform(jax.random.PRNGKey(0), (n_lanes,))
        tri, pdf = ats_sample(sd.ats, p, nrm, u)
        # pdf from the parent walk must match the descent pdf
        pdf2 = ats_pdf(sd.ats, tri, p, nrm)
        np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-4)
        # empirical selection frequency must match the pdf
        tri_np = np.asarray(tri)
        for t in np.unique(tri_np):
            freq = (tri_np == t).mean()
            sel = np.asarray(pdf)[tri_np == t].mean()
            assert abs(freq - sel) < 0.03, (t, freq, sel)

    def test_importance_prefers_bright_near_light(self):
        sd = _two_light_scene().compile(use_ats=True)
        n_lanes = 4096
        # shading point under the bright light
        p = jnp.tile(jnp.asarray([[0.0, 0.5, 0.0]]), (n_lanes, 1))
        nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n_lanes, 1))
        u = jax.random.uniform(jax.random.PRNGKey(1), (n_lanes,))
        tri, _ = ats_sample(sd.ats, p, nrm, u)
        # bright light (mesh 1 -> triangles 2,3) should dominate
        bright = np.isin(np.asarray(tri), [2, 3]).mean()
        assert bright > 0.9, bright

    def test_render_parity_with_flux_cdf(self):
        host = _two_light_scene()
        f0 = render(host.compile(), IntegratorPathTracing(max_depth=3),
                    spp=48, seed=0)
        f1 = render(host.compile(use_ats=True), IntegratorPathTracing(max_depth=3),
                    spp=48, seed=1)
        m0, m1 = f0["primal"].mean(), f1["primal"].mean()
        assert abs(m0 - m1) / m0 < 0.1, (m0, m1)


class TestSplitting:
    """Variance-splitting ATS traversal for single scattering
    (sample_split, emitter.rs:1401-1487 + point_normal.rs:2455-2580)."""

    def test_split_traversal_unbiased(self):
        from rustlight_tpu.scene import make_volume
        from rustlight_tpu.integrators import IntegratorPointNormal
        sc = _two_light_scene()
        sc.volume = make_volume(sigma_s=(0.02,) * 3)
        sd = sc.compile(use_ats=True)
        ref = render(sd, IntegratorPointNormal(strategies=("equiangular",)),
                     spp=48, seed=1)["primal"].mean()
        for sf in (0.0, 0.7):
            f = render(sd, IntegratorPointNormal(strategies=("equiangular",),
                                                 splitting=sf), spp=24, seed=2)
            m = f["primal"].mean()
            assert abs(m - ref) / ref < 0.15, (sf, m, ref)

    def test_split_slots_pdf(self):
        import jax
        import jax.numpy as jnp
        from rustlight_tpu.scene.ats import ats_sample_split
        sd = _two_light_scene().compile(use_ats=True)
        n = 64
        o = jnp.tile(jnp.asarray([[0.0, 2.0, -6.0]]), (n, 1))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        tmax = jnp.full(n, 16.0)
        u = jax.random.uniform(jax.random.PRNGKey(0), (n,))
        us = jax.random.uniform(jax.random.PRNGKey(1), (n, 40))
        # full splitting: every lane must enumerate all 4 light tris, pdf 1
        tri, pdf, valid, overflow = ats_sample_split(
            sd.ats, o, d, tmax, u, us, 1.0, 8)
        assert not bool(overflow.any())
        assert int(valid.sum(-1).min()) == 4          # 2 quads = 4 tris
        assert np.allclose(np.asarray(pdf)[np.asarray(valid)], 1.0)
        # no splitting: exactly one light with pdf <= 1
        tri1, pdf1, valid1, _ = ats_sample_split(
            sd.ats, o, d, tmax, u, us, 0.0, 8)
        assert int(valid1.sum(-1).max()) == 1
        assert float(np.asarray(pdf1)[np.asarray(valid1)].max()) <= 1.0 + 1e-5
