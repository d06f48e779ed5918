"""Laplacian-pyramid L1 loss (reference loss_fn/laplacian_pyramid_loss.py).

5-level pyramid built with the binomial 5x5/256 kernel, reflect padding,
decimate-by-2 downsampling and zero-stuffed upsampling with a 4x kernel;
per-level L1 losses summed. NHWC, jit-friendly (levels static).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

_K1D = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0  # 5x5/256 separable


@functools.lru_cache(maxsize=4)
def _kernel_2d() -> np.ndarray:
    return np.outer(_K1D, _K1D).astype(np.float32)  # sums to 1


def _conv_gauss(x: jnp.ndarray, gain: float = 1.0) -> jnp.ndarray:
    """Depthwise 5x5 Gaussian with reflect pad 2 (separable form)."""
    k = jnp.asarray(_K1D, x.dtype) * np.sqrt(gain)
    x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    # separable: filter H then W (each with the 1-D kernel)
    xs = sum(x[:, i : x.shape[1] - 4 + i] * k[i] for i in range(5))
    xs = sum(xs[:, :, i : xs.shape[2] - 4 + i] * k[i] for i in range(5))
    return xs


def _downsample(x):
    return x[:, ::2, ::2, :]


def _upsample(x):
    b, h, w, c = x.shape
    up = jnp.zeros((b, h, 2, w, 2, c), x.dtype)
    up = up.at[:, :, 0, :, 0, :].set(x)
    up = up.reshape(b, 2 * h, 2 * w, c)
    return _conv_gauss(up, gain=4.0)


def laplacian_pyramid(img: jnp.ndarray, max_levels: int = 3):
    current = img
    pyr = []
    for _ in range(max_levels):
        filtered = _conv_gauss(current)
        down = _downsample(filtered)
        up = _upsample(down)
        pyr.append(current - up)
        current = down
    return pyr


def lap_loss(pred: jnp.ndarray, target: jnp.ndarray, max_levels: int = 5) -> jnp.ndarray:
    """Sum of per-level mean-|.| differences (LapLoss.forward)."""
    pa = laplacian_pyramid(pred, max_levels)
    pb = laplacian_pyramid(target, max_levels)
    return sum(jnp.mean(jnp.abs(a - b)) for a, b in zip(pa, pb))
