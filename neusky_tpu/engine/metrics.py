"""Image metrics: PSNR, SSIM, MSE (+ LPIPS when weights are available).

Equivalents of the torchmetrics used by the reference
(``ddf_model.py:146-149``, ``neusky_model.py:1146-1149``).  SSIM follows the
standard Wang et al. formulation with an 11×11 Gaussian window, matching
torchmetrics defaults.  LPIPS needs pretrained VGG weights; in a zero-egress
environment it degrades to None unless weights are provided locally.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def psnr(pred: np.ndarray, target: np.ndarray, data_range: float = 1.0) -> float:
    mse = float(np.mean((pred - target) ** 2))
    if mse <= 1e-12:
        return 100.0
    return float(10.0 * np.log10(data_range**2 / mse))


def mse(pred: np.ndarray, target: np.ndarray) -> float:
    return float(np.mean((pred - target) ** 2))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g)


def _conv2d_same(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Valid-region 2D convolution per channel via FFT-free sliding windows.
    img: [H, W]; kernel: [k, k] → [H-k+1, W-k+1]."""
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(img, kernel.shape)
    return np.einsum("ijkl,kl->ij", win, kernel)


def ssim_image(pred: np.ndarray, target: np.ndarray, data_range: float = 1.0) -> float:
    """SSIM over [H, W, C] float images."""
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    window = _gaussian_window()
    vals = []
    if pred.ndim == 2:
        pred = pred[..., None]
        target = target[..., None]
    for c in range(pred.shape[-1]):
        x = pred[..., c].astype(np.float64)
        y = target[..., c].astype(np.float64)
        mu_x = _conv2d_same(x, window)
        mu_y = _conv2d_same(y, window)
        mu_x2, mu_y2, mu_xy = mu_x**2, mu_y**2, mu_x * mu_y
        sigma_x = _conv2d_same(x * x, window) - mu_x2
        sigma_y = _conv2d_same(y * y, window) - mu_y2
        sigma_xy = _conv2d_same(x * y, window) - mu_xy
        s = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)) / (
            (mu_x2 + mu_y2 + c1) * (sigma_x + sigma_y + c2)
        )
        vals.append(s.mean())
    return float(np.mean(vals))


def lpips_image(pred: np.ndarray, target: np.ndarray) -> Optional[float]:
    """LPIPS (VGG16), natively in JAX (``engine/lpips.py``).

    Uses pretrained VGG weights when present on disk; otherwise a
    seeded random-feature VGG (labelled via ``lpips_flavour()`` — still a
    useful perceptual distance per the LPIPS paper, but not comparable to
    published pretrained numbers)."""
    try:
        from neusky_tpu.engine.lpips import lpips

        val, _ = lpips(pred, target)
        return val
    except Exception:
        return None


def lpips_flavour() -> Optional[str]:
    """"vgg16-pretrained" | "vgg16-random" | None — report next to LPIPS."""
    try:
        from neusky_tpu.engine.lpips import _cache

        return _cache.get("flavour")
    except Exception:
        return None
