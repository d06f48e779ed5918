"""Bilinear resize with PyTorch `align_corners=True` semantics.

The reference model downsamples its input pyramid and upsamples flow
fields with ``F.interpolate(mode='bilinear', align_corners=True)``
(see /root/reference/network/network_base.py:11-18,443-448). Parity of
these resizes matters for PSNR parity, so we implement the exact
source-coordinate formula ``src = i * (in - 1) / (out - 1)`` as two
separable 1-D gathers (cheap, exact, and XLA-fusable on TPU).

All ops are NHWC and shape-static (sizes are Python ints at trace time).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _axis_coeffs(in_size: int, out_size: int):
    """Gather indices and lerp weights for one axis (align_corners=True)."""
    if out_size == 1:
        src = np.zeros((1,), np.float64)
    else:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    return i0.astype(np.int32), i1.astype(np.int32), w1


def _resize_axis(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if out_size == in_size:
        return x
    i0, i1, w1 = _axis_coeffs(in_size, out_size)
    i0 = jnp.asarray(i0)
    i1 = jnp.asarray(i1)
    w1 = jnp.asarray(w1, dtype=x.dtype)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w1 = w1.reshape(shape)
    x0 = jnp.take(x, i0, axis=axis)
    x1 = jnp.take(x, i1, axis=axis)
    return x0 + (x1 - x0) * w1


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize [..., H, W, C] to [..., out_h, out_w, C], align_corners=True."""
    x = _resize_axis(x, x.ndim - 3, out_h)
    x = _resize_axis(x, x.ndim - 2, out_w)
    return x


def resize_scale(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """`F.interpolate(scale_factor=scale)` parity: out = floor(in * scale)."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, int(h * scale), int(w * scale))


def downsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    return resize_scale(x, 0.5)


def upsample_flow(flow: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Upsample a flow field [..., H, W, 2] and scale its magnitude.

    Parity with `upsample_flow` (reference network_base.py:11-18).
    """
    h, w = flow.shape[-3], flow.shape[-2]
    return resize_bilinear(flow, h * factor, w * factor) * factor
