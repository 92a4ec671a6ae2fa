"""Cross-estimator consistency for volumetric transport.

Oracle: every unbiased single-scattering estimator must agree in expectation
— path(single_scattering), point_normal strategies, plane_single strategies,
and the photon-primitive estimators (which also capture multiple scattering,
so they are only lower-bounded here).
"""
import numpy as np
import pytest

from rustlight_tpu.models import cornell_box
from rustlight_tpu.scene import make_volume
from rustlight_tpu.integrators import (
    IntegratorPathTracing, IntegratorPointNormal, IntegratorSinglePlane,
    IntegratorVolPrimitives, render,
)


def _scene():
    sc = cornell_box(32, 32)
    sc.volume = make_volume(sigma_s=(0.003, 0.003, 0.003))
    return sc.compile()


SC = _scene()
REF = render(SC, IntegratorPointNormal(strategies=("equiangular",)), spp=48,
             seed=3)["primal"].mean()


class TestSingleScatteringConsistency:
    def test_path_single_scatter_matches(self):
        f = render(SC, IntegratorPathTracing(max_depth=2, hard_cap=2,
                                             single_scattering=True,
                                             min_depth=1), spp=64, seed=1)
        assert abs(f["primal"].mean() - REF) / REF < 0.15

    @pytest.mark.parametrize("strats,tol", [
        (("tr",), 0.25),   # transmittance sampling has heavy tails near lights
        (("tr", "equiangular", "eq_clamp"), 0.15),
    ])
    def test_point_normal_strategies(self, strats, tol):
        f = render(SC, IntegratorPointNormal(strategies=strats), spp=32, seed=2)
        assert abs(f["primal"].mean() - REF) / REF < tol

    @pytest.mark.parametrize("strat", ["uv", "average", "dmis", "cmis"])
    def test_plane_single(self, strat):
        f = render(SC, IntegratorSinglePlane(nb_primitive=256, strategy=strat),
                   spp=4, seed=4)
        assert abs(f["primal"].mean() - REF) / REF < 0.25, f["primal"].mean()

    def test_plane_single_uncorrelated(self):
        f = render(SC, IntegratorSinglePlane(strategy="average",
                                             uncorrelated=True), spp=8, seed=5)
        assert abs(f["primal"].mean() - REF) / REF < 0.25

    @pytest.mark.parametrize("prim", ["bre", "beams"])
    def test_vol_primitives_capture_at_least_single(self, prim):
        f = render(SC, IntegratorVolPrimitives(
            nb_primitive=2048, primitives=prim, radius=6.0, hard_cap=4),
            spp=2, seed=6)
        m = f["primal"].mean()
        # photon estimators include multiple scattering and surface-bounced
        # volumetric paths (albedo ~1, optical depth ~1.6): several times the
        # pure single-scatter reference is expected
        assert m > 0.5 * REF, (m, REF)
        assert m < 10.0 * REF, (m, REF)


class TestMediumPathTracer:
    def test_vacuum_limit(self):
        sc0 = cornell_box(24, 24)
        ref = render(sc0.compile(), IntegratorPathTracing(max_depth=3), spp=16,
                     seed=0)["primal"].mean()
        sc0.volume = make_volume(sigma_s=(1e-7, 1e-7, 1e-7))
        f = render(sc0.compile(), IntegratorPathTracing(max_depth=3, hard_cap=3),
                   spp=16, seed=0)["primal"].mean()
        assert abs(f - ref) / ref < 0.02


class TestTaylorStrategies:
    """Degree-6 Taylor product sampling (point_normal_poly.rs)."""

    def test_poly_mixture_normalized(self):
        import jax
        import jax.numpy as jnp
        from rustlight_tpu.integrators import point_normal_poly as pp
        d_l = jnp.array([0.5, 2.0, 10.0, 100.0])
        ta = jnp.array([-0.8, -1.2, 0.1, -0.4])
        tb = jnp.array([1.2, 1.5, 1.4, 1.52])
        c = pp.poly6_tr(d_l, 0.01)
        st = pp.taylor_setup(c, ta, tb, pp.clamp_angle_tr(0.01, d_l))
        c2 = tuple(ci[:, None] for ci in c)
        st2 = {k: (v[:, None] if hasattr(v, "ndim") and v.ndim == 1 else v)
               for k, v in st.items()}
        th = ta[:, None] + jnp.linspace(0, 1, 8001)[None, :] * (tb - ta)[:, None]
        integ = jnp.trapezoid(pp.taylor_pdf(c2, st2, th), th, axis=1)
        assert np.allclose(np.asarray(integ), 1.0, atol=2e-3)
        # sampled pdf must equal pdf() at the sampled angle (MIS consistency)
        u = jax.random.uniform(jax.random.PRNGKey(0), (4, 4096))
        ths, pdfs = jax.vmap(lambda ui: pp.taylor_sample(c, st, ui),
                             in_axes=1, out_axes=1)(u)
        pdf_at = jax.vmap(lambda t: pp.taylor_pdf(c, st, t),
                          in_axes=1, out_axes=1)(ths)
        assert np.allclose(np.asarray(pdfs), np.asarray(pdf_at), rtol=1e-5)

    @pytest.mark.parametrize("strats", [
        ("pn",), ("taylor_tr",), ("taylor_phase",),
        ("pn_taylor_tr",), ("pn_taylor_phase",),
        ("best",), ("pn_best",),
        ("taylor_phase", "equiangular"),
    ])
    def test_agrees_with_equiangular(self, strats):
        from rustlight_tpu.models import cornell_box
        sc = cornell_box(24, 24)
        sc.volume = make_volume(sigma_s=(0.003,) * 3, g=0.4)
        sd = sc.compile()
        ref = render(sd, IntegratorPointNormal(strategies=("equiangular",)),
                     spp=48, seed=3)["primal"].mean()
        f = render(sd, IntegratorPointNormal(strategies=strats), spp=24,
                   seed=7)
        assert abs(f["primal"].mean() - ref) / ref < 0.12


class TestWarpStrategies:
    @pytest.mark.parametrize("ws,chars", [("linear", "T"), ("bezier", "P"),
                                          ("bezier", "TP")])
    def test_warps_agree_with_equiangular(self, ws, chars):
        sc = cornell_box(24, 24)
        sc.volume = make_volume(sigma_s=(0.003,) * 3, g=0.3)
        sd = sc.compile()
        ref = render(sd, IntegratorPointNormal(strategies=("equiangular",)),
                     spp=48, seed=1)["primal"].mean()
        f = render(sd, IntegratorPointNormal(strategies=("warp",), warps=chars,
                                             warps_strategy=ws), spp=24, seed=2)
        assert abs(f["primal"].mean() - ref) / ref < 0.15


class TestPhaseConnection:
    """PHASE contribution strategy (sample the phase function, intersect the
    emitter; Strategies::PHASE, point_normal.rs:2373-2395) must agree with
    the explicit connection in expectation (high variance: the light's solid
    angle is small, so the tolerance is loose)."""

    def test_phase_agrees_with_ex(self):
        from rustlight_tpu.models import cornell_box
        sc = cornell_box(16, 16)
        sc.volume = make_volume(sigma_s=(0.003,) * 3, g=0.4)
        sd = sc.compile()
        ref = render(sd, IntegratorPointNormal(strategies=("equiangular",)),
                     spp=64, seed=3)["primal"].mean()
        f = render(sd, IntegratorPointNormal(strategies=("equiangular",),
                                             connection="phase"),
                   spp=256, seed=9)
        m = f["primal"].mean()
        assert abs(m - ref) / ref < 0.2, (m, ref)


class TestPhotonPrimitiveConsistency:
    """Sharper oracle for the photon-primitive family: in a LOW-ALBEDO
    medium (albedo 1/6, same optical depth as SC) multiple scattering is a
    small correction, so BRE / beams / planes / VRL must all agree with the
    single-scatter path oracle — not just sit inside a 0.5x-10x bracket —
    and with each other (they estimate the same integral with 2D/1D/0D
    kernels and unbiased MC respectively)."""

    def test_primitive_family_agrees_in_absorbing_medium(self):
        from rustlight_tpu.integrators import render
        sc = cornell_box(24, 24)
        sc.volume = make_volume(sigma_s=(0.0005,) * 3, sigma_a=(0.0025,) * 3)
        sd = sc.compile()
        ref = render(sd, IntegratorPathTracing(
            max_depth=2, hard_cap=2, min_depth=1, single_scattering=True),
            spp=64, seed=1)["primal"].mean()
        means = {}
        for prim in ("bre", "beams", "planes", "vrl"):
            f = render(sd, IntegratorVolPrimitives(
                nb_primitive=4096, primitives=prim, radius=4.0, hard_cap=3),
                spp=4, seed=6)
            means[prim] = float(f["primal"].mean())
        # Expected decomposition of the excess over the SINGLE-scatter ref
        # (measured: planes +0.24, vrl +0.25, beams +0.38, bre +0.30-0.41):
        #   * photons multi-scatter (hard_cap=3; planes NEED >= 3 bounces,
        #     vol_primitives.py:222): first-order excess ~ albedo = 1/6,
        #     second ~ 1/36 -> ~ +0.20 for the unbiased estimators;
        #   * bre/beams add positive 2D/1D kernel blur bias near the light.
        for prim, m in means.items():
            hi = 0.60 if prim in ("bre", "beams") else 0.45
            assert 0.02 < (m - ref) / ref < hi, (prim, m, ref, means)
        # family-internal consistency: same integral, four estimators
        vals = sorted(means.values())
        assert vals[-1] / max(vals[0], 1e-12) < 1.3, means
