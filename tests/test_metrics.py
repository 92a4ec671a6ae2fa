"""Metric definitions vs closed forms (parity with scripts/tonemap.py)."""
import numpy as np

from rustlight_tpu.utils.metrics import (
    compute_metric, metric_scalar, ssim, falsecolor,
)


def test_metric_formulas():
    ref = np.full((4, 4, 3), 2.0)
    test = np.full((4, 4, 3), 1.0)
    assert np.allclose(compute_metric(ref, test, "l1"), 1.0)
    assert np.allclose(compute_metric(ref, test, "l2"), 1.0)
    assert np.allclose(compute_metric(ref, test, "mape", eps=0.0), 0.5)
    assert np.allclose(compute_metric(ref, test, "smape", eps=0.0), 2.0 / 3.0)
    assert np.allclose(compute_metric(ref, test, "mrse", eps=0.0), 0.25)
    assert np.isclose(metric_scalar(ref, test, "rmse"), 1.0)


def test_ssim_identity_and_noise():
    rng = np.random.default_rng(0)
    img = rng.random((32, 32, 3))
    assert ssim(img, img) > 0.999
    noisy = img + rng.normal(0, 0.3, img.shape)
    assert ssim(img, noisy) < 0.9
    assert metric_scalar(img, img, "dssim") < 1e-3


def test_falsecolor_shape_and_range():
    err = np.random.rand(8, 8, 3)
    fc = falsecolor(err, (0, 1))
    assert fc.shape == (8, 8, 3)
    assert fc.min() >= 0.0 and fc.max() <= 1.0


def test_veach_mis_l2_outlier_is_near_delta_noise():
    """Pins the explanation of the veach_mis/path l2 ~0.49 regression row
    (an order of magnitude above the other rows while l1 0.060 and dssim
    0.044 sit in the pack): the squared error concentrates almost entirely
    on ~50 of 12288 pixels — directly-visible small-light silhouettes and
    the exponent-5000 specular highlight, near-delta luminance features
    where a 32-spp render against a 256-spp self-reference is pure
    coverage/variance noise. A 3-seed study (seeds 0/1/2: l2 0.485 / 0.514
    / 0.515, top-50 share 0.943-0.946, clipped l2 0.028-0.029) shows the
    stored row is typical, symmetric across seeds, and not bias. If this
    test starts failing, the error mass has MOVED — that is a real drift
    even if the scalar l2 still passes the gate band."""
    from pathlib import Path
    import pytest
    from rustlight_tpu.utils import image as rimage
    from rustlight_tpu.utils.metrics import compute_metric

    root = Path(__file__).parent.parent / "regress"
    ref_p = root / "refs" / "veach_mis.exr"
    img_p = root / "veach_mis_path.exr"
    if not (ref_p.exists() and img_p.exists()):
        pytest.skip("regression artifacts not present")
    ref = rimage.load(str(ref_p))
    img = rimage.load(str(img_p))
    err = compute_metric(ref, img, "l2").mean(-1)
    flat = np.sort(err.ravel())[::-1]
    k = 50
    assert flat[:k].sum() / flat.sum() > 0.85   # top-heavy: delta features
    assert flat[k:].mean() < 0.05               # clipped l2 is in the pack
    # the hot pixels live on bright features in ref OR render (fireflies
    # cut both ways at these spp), not spread over the diffuse field
    idx = np.argsort(err.ravel())[::-1][:k]
    lum = np.maximum(ref.mean(-1).ravel()[idx], img.mean(-1).ravel()[idx])
    assert np.median(lum) > 1.0


def test_bench_correctness_gate():
    """bench.py's TPU correctness envelope (VERDICT r4 item 6): the committed
    reference must pass itself, a statistically-identical render (noise at the
    measured seed-to-seed floor) must pass, and a deliberately-perturbed
    render (+5% uniform bias, far above the floor) must FAIL."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    ref = np.load(os.path.join(os.path.dirname(bench.__file__),
                               "regress", "bench_ref.npz"))
    bm, block = ref["blockmean"].astype(np.float64), int(ref["block"])
    img = np.repeat(np.repeat(bm, block, axis=0), block, axis=1)

    assert bench._correctness_gate(img)["ok"]

    rng = np.random.default_rng(3)
    noisy = img + rng.normal(0.0, float(ref["floor_l1"]), img.shape)
    assert bench._correctness_gate(noisy)["ok"]

    res = bench._correctness_gate(img * 1.05)
    assert not res["ok"] and res["l1_vs_ref"] > 4.0 * res["floor_l1"]

    os.environ["RUSTLIGHT_TPU_BENCH_SELFTEST_PERTURB"] = "0.05"
    try:
        assert not bench._correctness_gate(img)["ok"]
    finally:
        del os.environ["RUSTLIGHT_TPU_BENCH_SELFTEST_PERTURB"]
