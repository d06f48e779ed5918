"""PSNR / SSIM metrics with reference-exact protocols.

Re-implements the metric stack of the reference benchmarks
(/root/reference/benchmark/pytorch_msssim.py, psnr_ssim.py) in JAX:

  * `ssim_matlab` — the 3D-conv variant that treats an RGB image as a
    volume (11x11x11 Gaussian sigma=1.5, replicate pad 5 on C, H, W:
    pytorch_msssim.py:82-135). This is the number reported on
    Vimeo90K / UCF101 / SNU-FILM.
  * `ssim` — plain per-channel 2D SSIM (pytorch_msssim.py:28-79).
  * `msssim` — 5-scale multi-scale SSIM (pytorch_msssim.py:138-164).
  * `psnr` — -10*log10(MSE) on [0, 1] images (test_vimeo90k.py:127).
  * `ie` — interpolation error (psnr_ssim.py:134-139).

All functions take NHWC arrays (f32, [0, 1] unless stated). Gaussian
filtering is separable (3 1-D convs) — mathematically identical to the
reference's dense conv, MXU/VPU-friendly, and jit-compatible.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _gaussian_1d(window_size: int, sigma: float = 1.5) -> np.ndarray:
    g = np.array(
        [
            math.exp(-((x - window_size // 2) ** 2) / float(2 * sigma**2))
            for x in range(window_size)
        ],
        dtype=np.float64,
    )
    return (g / g.sum()).astype(np.float32)


def _filter_axis(x: jnp.ndarray, axis: int, window: np.ndarray) -> jnp.ndarray:
    """Valid-mode 1-D correlation along `axis` (kernel is symmetric)."""
    n = window.shape[0]
    k = jnp.asarray(window, dtype=x.dtype)
    out = None
    for i in range(n):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, x.shape[axis] - (n - 1) + i)
        term = x[tuple(sl)] * k[i]
        out = term if out is None else out + term
    return out


def _pad_replicate(x: jnp.ndarray, axes, amount: int) -> jnp.ndarray:
    pads = [(0, 0)] * x.ndim
    for a in axes:
        pads[a] = (amount, amount)
    return jnp.pad(x, pads, mode="edge")


def _ssim_terms(img1, img2, filt, C1, C2):
    mu1 = filt(img1)
    mu2 = filt(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu1_mu2
    v1 = 2.0 * sigma12 + C2
    v2 = sigma1_sq + sigma2_sq + C2
    ssim_map = ((2 * mu1_mu2 + C1) * v1) / ((mu1_sq + mu2_sq + C1) * v2)
    cs = jnp.mean(v1 / v2)
    return ssim_map, cs


def _val_range(img1, val_range):
    if val_range is not None:
        return float(val_range)
    # reference heuristic (pytorch_msssim.py:30-41); traced-friendly form
    max_val = jnp.where(jnp.max(img1) > 128, 255.0, 1.0)
    min_val = jnp.where(jnp.min(img1) < -0.5, -1.0, 0.0)
    return max_val - min_val


def ssim_matlab(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
                val_range=None, full: bool = False):
    """3D-volume SSIM over (C, H, W); NHWC input [B, H, W, C].

    Parity: pytorch_msssim.ssim_matlab (reference :82-135) — replicate
    pad 5 on all three of C/H/W, Gaussian window over the volume.
    """
    B, H, W, C = img1.shape
    L = _val_range(img1, val_range)
    rs = min(window_size, H, W)
    g = _gaussian_1d(rs)

    def filt(x):
        # pad 5 regardless of window (reference hardcodes 5)
        x = _pad_replicate(x, (1, 2, 3), 5)
        x = _filter_axis(x, 1, g)  # H
        x = _filter_axis(x, 2, g)  # W
        x = _filter_axis(x, 3, g)  # C (volume axis)
        return x

    C1 = (0.01 * L) ** 2
    C2 = (0.03 * L) ** 2
    ssim_map, cs = _ssim_terms(img1, img2, filt, C1, C2)
    ret = jnp.mean(ssim_map)
    if full:
        return ret, cs
    return ret


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         val_range=None, full: bool = False, size_average: bool = True):
    """Per-channel 2D SSIM (pytorch_msssim.py:28-79); NHWC input."""
    B, H, W, C = img1.shape
    L = _val_range(img1, val_range)
    rs = min(window_size, H, W)
    g = _gaussian_1d(rs)

    def filt(x):
        x = _pad_replicate(x, (1, 2), 5)
        x = _filter_axis(x, 1, g)
        x = _filter_axis(x, 2, g)
        return x

    C1 = (0.01 * L) ** 2
    C2 = (0.03 * L) ** 2
    ssim_map, cs = _ssim_terms(img1, img2, filt, C1, C2)
    ret = jnp.mean(ssim_map) if size_average else jnp.mean(ssim_map, axis=(1, 2, 3))
    if full:
        return ret, cs
    return ret


_MSSSIM_WEIGHTS = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333], np.float32)


def msssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
           val_range=None, normalize: bool = False):
    """Multi-scale SSIM (pytorch_msssim.py:138-164); NHWC input."""
    levels = len(_MSSSIM_WEIGHTS)
    mssim, mcs = [], []
    for _ in range(levels):
        s, cs = ssim(img1, img2, window_size=window_size, val_range=val_range, full=True)
        mssim.append(s)
        mcs.append(cs)
        # avg_pool2d kernel 2 stride 2 (NHWC)
        img1 = jax.lax.reduce_window(
            img1, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0
        img2 = jax.lax.reduce_window(
            img2, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0
    mssim = jnp.stack(mssim)
    mcs = jnp.stack(mcs)
    if normalize:
        mssim = (mssim + 1) / 2
        mcs = (mcs + 1) / 2
    w = jnp.asarray(_MSSSIM_WEIGHTS)
    pow1 = mcs**w
    pow2 = mssim**w
    # reference quirk (pytorch_msssim.py:163): the broadcast multiplies
    # pow2[-1] into every pow1 term before the product
    return jnp.prod(pow1[:-1] * pow2[-1])


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """-10 log10(MSE); images in [0, 1] (test_vimeo90k.py:127)."""
    mse = jnp.mean((gt - pred) ** 2)
    return -10.0 * jnp.log10(mse)


def ie(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Interpolation error on rounded uint8 scale (psnr_ssim.py:134-139)."""
    return jnp.mean(jnp.abs(jnp.round(pred * 255.0) - jnp.round(gt * 255.0)))
