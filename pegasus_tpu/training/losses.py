"""Training losses: L1 + D-SSIM, the Inria 3DGS objective.

The reference trains its assets through the gaussian-splatting submodule's
``train.training`` (reference: src/gs/gs_training.py:46-47), whose loss is
(1 - lambda) * L1 + lambda * (1 - SSIM), lambda = 0.2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over an [H, W, C] image pair in [0, 1]."""
    c1 = 0.01**2
    c2 = 0.03**2
    win = _gaussian_window(window_size)[:, :, None, None]  # HWIO, per-channel

    def filt(x):
        # depthwise conv: [H, W, C] -> [1, H, W, C]
        x4 = x[None]
        ch = x.shape[-1]
        k = jnp.tile(win, (1, 1, 1, ch))
        return jax.lax.conv_general_dilated(
            x4, k,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=ch,
        )[0]

    mu1 = filt(img1)
    mu2 = filt(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu12
    s = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(s)


def gs_loss(pred: jnp.ndarray, gt: jnp.ndarray, lambda_dssim: float = 0.2):
    l1 = jnp.mean(jnp.abs(pred - gt))
    s = ssim(pred, gt)
    return (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - s), {
        "l1": l1,
        "ssim": s,
    }
