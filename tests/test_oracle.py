"""Statistical agreement between the wavefront renderer and the independent
scalar CPU oracle (tests/oracle_pt.py — VERDICT r3 item 4).

Both sides render the same cbox configurations with independent RNGs; their
per-pixel means must agree within the COMBINED Monte-Carlo noise of the two
estimates. The gate is a global z-test on the image-mean difference (the
per-pixel errors are independent across pixels, so the standard error of the
image mean is sqrt(sum var_i) / n_pix) plus a per-pixel outlier-rate check.
A shared wavefront-side estimator bias (the risk this oracle retires) would
shift every pixel the same way and trip the global test long before the
outlier one.
"""
import numpy as np
import pytest

from rustlight_tpu.integrators.common import render
from rustlight_tpu.integrators.path import IntegratorPathTracing
from rustlight_tpu.models.cbox import cornell_box
from rustlight_tpu.scene.volume import make_volume

from oracle_pt import OracleScene

SIZE = 12      # tiny film: the oracle is deliberately slow scalar python


def _agree(config_name, host, max_depth, spp_wave, spp_oracle,
           volume=None, seed=7):
    if volume is not None:
        host.volume = volume
    oracle = OracleScene(host)
    sd = host.compile()

    integ = IntegratorPathTracing(max_depth=max_depth, rr_depth=None)
    film = render(sd, integ, spp_wave, seed=seed, variance=True)
    img_w = np.asarray(film.buffers["primal"], np.float64)
    var_w = np.asarray(film.buffers["variance"], np.float64) / spp_wave

    img_o, var_o = oracle.render(host.camera.width, host.camera.height,
                                 spp_oracle, seed=seed + 1,
                                 max_depth=max_depth)

    assert np.isfinite(img_w).all() and np.isfinite(img_o).all()
    assert img_w.mean() > 1e-3, f"{config_name}: wavefront render is black"
    assert img_o.mean() > 1e-3, f"{config_name}: oracle render is black"

    diff = img_w - img_o
    se2 = var_w + var_o                      # [h, w, 3] variance of diff
    n_pix = diff.size
    # global z-test per the docstring; small epsilon guards epsilon-policy
    # differences (ray offsets) that are not estimator bias
    gdiff = float(diff.mean())
    gse = float(np.sqrt(se2.sum()) / n_pix)
    tol = 6.0 * gse + 1e-3 * float(img_o.mean())
    assert abs(gdiff) < tol, (
        f"{config_name}: image means differ by {gdiff:.5f} "
        f"(allowed {tol:.5f}; wave {img_w.mean():.5f} vs oracle "
        f"{img_o.mean():.5f})")

    # outlier rate: fraction of per-pixel |z| > 5 must be tiny. se can be
    # under-estimated at low spp, so allow a small floor.
    z = np.abs(diff) / np.maximum(np.sqrt(se2), 1e-4)
    frac = float((z > 5.0).mean())
    assert frac < 0.02, f"{config_name}: {frac:.3f} of pixels |z|>5"


def test_oracle_direct_lighting():
    # max_depth=2 == emission + direct lighting (one NEE + one BSDF-hit MIS)
    host = cornell_box(SIZE, SIZE)
    _agree("direct(md=2)", host, max_depth=2, spp_wave=512, spp_oracle=96)


def test_oracle_path_nee_mis():
    host = cornell_box(SIZE, SIZE)
    _agree("path(md=5)", host, max_depth=5, spp_wave=384, spp_oracle=80)


def test_oracle_homogeneous_medium():
    host = cornell_box(SIZE, SIZE)
    vol = make_volume(sigma_s=(0.0025, 0.0025, 0.0025),
                      sigma_a=(0.0004, 0.0004, 0.0004), g=0.0)
    _agree("medium(md=4)", host, max_depth=4, spp_wave=384, spp_oracle=80,
           volume=vol)


def test_oracle_phong_cbox():
    """Glossy transport: cbox with Modified-Phong blocks — exercises the
    oracle's independent phong eval/pdf/sample (lobe mix, mirror-lobe
    normalization, mixture-pdf MIS against NEE)."""
    from rustlight_tpu.bsdfs import phong
    host = cornell_box(SIZE, SIZE, mat_overrides={
        "blocks": phong(kd=(0.2,) * 3, ks=(0.5,) * 3, exponent=50.0,
                        weight_specular=0.5)})
    _agree("cbox-phong(md=4)", host, max_depth=4, spp_wave=384,
           spp_oracle=80)


def test_oracle_veach_mis_direct():
    """The veach_mis MIS stress scene at max_depth=2 (emission + direct):
    four glossy plates (exponent 40..5000) x four light sizes — the
    configuration where a MIS-weight defect would separate the wavefront
    renderer from the oracle far outside the combined noise."""
    from rustlight_tpu.models.veach import veach_mis
    _agree("veach(md=2)", veach_mis(16, 12), max_depth=2, spp_wave=512,
           spp_oracle=96)


def test_oracle_glass_cbox():
    """Specular transport: cbox with smooth-dielectric (glass) blocks —
    delta chains through Fresnel-selected reflect/refract with the
    radiance-transport eta^2 scaling, NEE suppressed at delta vertices,
    emission picked up with weight 1 after a delta bounce."""
    from rustlight_tpu.bsdfs import glass
    host = cornell_box(SIZE, SIZE, mat_overrides={"blocks": glass()})
    _agree("cbox-glass(md=6)", host, max_depth=6, spp_wave=512,
           spp_oracle=96)
