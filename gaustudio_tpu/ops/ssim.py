"""SSIM / D-SSIM loss for 3DGS training.

The reference ships no training loss (SURVEY.md §3.5); this follows the
canonical Inria 3DGS recipe: 11x11 Gaussian window (sigma 1.5), per-channel
SSIM, loss = (1-lambda) L1 + lambda (1 - SSIM) with lambda=0.2.
Implemented with two separable depthwise convolutions so XLA fuses it into
a handful of TPU-friendly kernels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_C1 = 0.01**2
_C2 = 0.03**2


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    xs = np.arange(size) - size // 2
    g = np.exp(-(xs**2) / (2 * sigma**2))
    return jnp.asarray(g / g.sum(), jnp.float32)


def _blur(img, kernel):
    """Separable Gaussian blur of [C, H, W] with SAME padding."""
    k = kernel.shape[0]
    pad = k // 2
    x = jnp.pad(img, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    x = jnp.moveaxis(x, 1, -1)  # [C, W, H+p]
    x = jax.vmap(lambda row: jnp.convolve(row, kernel, mode="valid", precision=jax.lax.Precision.HIGHEST))(
        x.reshape(-1, x.shape[-1])
    ).reshape(x.shape[0], x.shape[1], -1)
    x = jnp.moveaxis(x, -1, 1)  # [C, H, W]
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="edge")
    x = jax.vmap(lambda row: jnp.convolve(row, kernel, mode="valid", precision=jax.lax.Precision.HIGHEST))(
        x.reshape(-1, x.shape[-1])
    ).reshape(img.shape)
    return x


def ssim(img0, img1, window_size: int = 11, sigma: float = 1.5):
    """Mean SSIM between two [C, H, W] images in [0, 1]."""
    kernel = _gaussian_kernel(window_size, sigma)
    mu0 = _blur(img0, kernel)
    mu1 = _blur(img1, kernel)
    mu00 = mu0 * mu0
    mu11 = mu1 * mu1
    mu01 = mu0 * mu1
    s00 = _blur(img0 * img0, kernel) - mu00
    s11 = _blur(img1 * img1, kernel) - mu11
    s01 = _blur(img0 * img1, kernel) - mu01
    num = (2 * mu01 + _C1) * (2 * s01 + _C2)
    den = (mu00 + mu11 + _C1) * (s00 + s11 + _C2)
    return jnp.mean(num / den)


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a - b))


def rgb_loss(pred, gt, lambda_dssim: float = 0.2):
    """Canonical 3DGS photometric loss."""
    return (1.0 - lambda_dssim) * l1_loss(pred, gt) + lambda_dssim * (
        1.0 - ssim(pred, gt)
    )


def psnr(pred, gt):
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
