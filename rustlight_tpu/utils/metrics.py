"""Image-error metrics for regression testing.

Mirrors the reference's offline metric definitions
(scripts/tonemap.py:14-30: l1 / l2 / mrse / mape / smape) plus rmse and DSSIM
(1 - SSIM, the metric tests/launch.py reports), all in numpy so the harness
has no device dependency.
"""
from __future__ import annotations

import numpy as np


def compute_metric(ref, test, metric: str, eps: float = 1e-2):
    """Per-pixel error map (same semantics as the reference tonemap.py)."""
    ref = np.asarray(ref, np.float64)
    test = np.asarray(test, np.float64)
    diff = ref - test
    if metric == "l1":
        return np.abs(diff)
    if metric == "l2":
        return diff * diff
    if metric == "mrse":
        return diff * diff / (ref * ref + eps)
    if metric == "mape":
        return np.abs(diff) / (ref + eps)
    if metric == "smape":
        return 2.0 * np.abs(diff) / (ref + test + eps)
    raise ValueError(f"invalid metric {metric}")


def metric_scalar(ref, test, metric: str, eps: float = 1e-2) -> float:
    if metric == "rmse":
        return float(np.sqrt(compute_metric(ref, test, "l2", eps).mean()))
    if metric == "dssim":
        # the reference harness's dssim (tests/launch.py -> the
        # interactive-viewer analyze script) operates on TONEMAPPED LDR
        # with the (1 - SSIM) / 2 convention; SSIM on raw HDR with a
        # max-min data range is noise-dominated (a firefly rescales the
        # stabilizers and turns pure MC noise into dssim ~0.7)
        return float((1.0 - ssim(tonemap_ldr(ref), tonemap_ldr(test),
                                 data_range=1.0)) / 2.0)
    return float(compute_metric(ref, test, metric, eps).mean())


def tonemap_ldr(img):
    """Gamma-2.2 LDR transform (reference structure.rs:160-168), clipped to
    [0, 1] — the domain the reference harness computes dssim on."""
    x = np.clip(np.asarray(img, np.float64), 0.0, None)
    return np.clip(x ** (1.0 / 2.2), 0.0, 1.0)


def _gaussian_kernel(size=11, sigma=1.5):
    ax = np.arange(size) - size // 2
    g = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    k = np.outer(g, g)
    return k / k.sum()


def _filter2(img, k):
    """Valid-mode 2D convolution per channel (small images; numpy only)."""
    from numpy.lib.stride_tricks import sliding_window_view
    s = k.shape[0]
    win = sliding_window_view(img, (s, s), axis=(0, 1))
    return np.einsum("ijckl,kl->ijc", win, k)


def ssim(ref, test, data_range: float | None = None):
    """Mean SSIM over channels (Wang et al. 2004, 11x11 gaussian window)."""
    ref = np.asarray(ref, np.float64)
    test = np.asarray(test, np.float64)
    if ref.ndim == 2:
        ref = ref[..., None]
        test = test[..., None]
    if data_range is None:
        data_range = max(ref.max() - ref.min(), 1e-6)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    k = _gaussian_kernel()
    mu_x = _filter2(ref, k)
    mu_y = _filter2(test, k)
    sxx = _filter2(ref * ref, k) - mu_x ** 2
    syy = _filter2(test * test, k) - mu_y ** 2
    sxy = _filter2(ref * test, k) - mu_x * mu_y
    s = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)) / (
        (mu_x ** 2 + mu_y ** 2 + c1) * (sxx + syy + c2))
    return float(s.mean())


_VIRIDIS = np.asarray([
    (0.267, 0.005, 0.329), (0.283, 0.141, 0.458), (0.254, 0.265, 0.530),
    (0.207, 0.372, 0.553), (0.164, 0.471, 0.558), (0.128, 0.567, 0.551),
    (0.135, 0.659, 0.518), (0.267, 0.749, 0.441), (0.478, 0.821, 0.318),
    (0.741, 0.873, 0.150), (0.993, 0.906, 0.144)], np.float64)


def falsecolor(error, clip=(0.0, 1.0)):
    """Viridis heat map of a per-pixel error image (tonemap.py falsecolor)."""
    mean = np.mean(np.asarray(error, np.float64), axis=2)
    lo, hi = clip
    val = np.clip((mean - lo) / max(hi - lo, 1e-12), 0.0, 1.0)
    idx = val * (len(_VIRIDIS) - 1)
    i0 = np.clip(idx.astype(int), 0, len(_VIRIDIS) - 2)
    frac = (idx - i0)[..., None]
    return (_VIRIDIS[i0] * (1 - frac) + _VIRIDIS[i0 + 1] * frac).astype(np.float32)
