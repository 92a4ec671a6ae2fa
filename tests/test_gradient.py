"""Gradient-domain path tracing: both shift mappings.

Oracles: (a) the raw primal of each GDPT variant is an unbiased pixel
estimator — it must agree with the plain path tracer in expectation;
(b) the gradient buffers must track finite differences of a converged image
(validated via correlation away from the very-direct light edges);
(c) Poisson reconstruction must not be worse than the raw primal.
"""
import numpy as np
import pytest

from rustlight_tpu.models import cornell_box
from rustlight_tpu.integrators import IntegratorPathTracing, render
from rustlight_tpu.integrators.gradient import (
    IntegratorGradientPath, IntegratorGradientPathReconnect,
)

SC = cornell_box(24, 24).compile()
REF = np.asarray(render(SC, IntegratorPathTracing(max_depth=4, hard_cap=4),
                        spp=192, seed=0)["primal"])


class TestGradientPath:
    @pytest.mark.parametrize("cls", [IntegratorGradientPath,
                                     IntegratorGradientPathReconnect])
    def test_primal_unbiased(self, cls):
        g = cls(max_depth=4, hard_cap=4, recons="uniform")
        film = g.render(SC, spp=24, seed=1)
        m = film.buffers["primal_raw"].mean()
        assert abs(m - REF.mean()) / REF.mean() < 0.08, (m, REF.mean())

    def test_reconnect_gradients_track_finite_differences(self):
        g = IntegratorGradientPathReconnect(max_depth=4, hard_cap=4,
                                            recons="uniform")
        film = g.render(SC, spp=48, seed=2)
        gx = film.buffers["gradient_x"]
        vd = film.buffers["very_direct"]
        ind = REF - vd
        fdx = np.zeros_like(REF)
        fdx[:, :-1] = ind[:, 1:] - ind[:, :-1]
        fdvd = np.zeros_like(REF)
        fdvd[:, :-1] = vd[:, 1:] - vd[:, :-1]
        m = np.ones(REF.shape[:2], bool)
        m[:, -1] = False
        m[-1, :] = False
        m &= np.abs(fdvd).max(-1) < 1e-6   # skip very-direct discontinuities
        corr = np.corrcoef(gx[m].ravel(), fdx[m].ravel())[0, 1]
        assert corr > 0.5, corr   # fd reference is itself MC-noisy

    def test_reconstruction_improves_over_primal(self):
        g = IntegratorGradientPathReconnect(max_depth=4, hard_cap=4,
                                            recons="uniform")
        film = g.render(SC, spp=16, seed=3)
        rel = lambda a: np.mean(np.abs(a - REF) / (REF + 1e-2))
        assert rel(film.buffers["primal"]) < rel(film.buffers["primal_raw"])
