"""Bilinear resize with PyTorch `align_corners=True` semantics.

The reference model downsamples its input pyramid and upsamples flow
fields with ``F.interpolate(mode='bilinear', align_corners=True)``
(see /root/reference/network/network_base.py:11-18,443-448). Parity of
these resizes matters for PSNR parity, so we implement the exact
source-coordinate formula ``src = i * (in - 1) / (out - 1)`` as two
separable banded-matrix matmuls (exact, and MXU-native on TPU — a
gather formulation lowers to serial loops there).

All ops are NHWC and shape-static (sizes are Python ints at trace time).
"""
from __future__ import annotations

import functools

import jax
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
    """Resize one axis (float inputs only — interpolation is a lerp).

    Two formulations, picked by backend:

      * TPU: interpolation expressed as a banded-matrix matmul.
        `jnp.take` lowers to serial gather loops there (~100 ms of the
        4K frame went to pyramid/flow resizes), while the equivalent
        sparse matrix — built on the fly from the tiny static
        index/weight vectors, so no giant literals are baked into the
        executable — runs on the MXU in a couple of ms. Weight rows sum
        to exactly 1 (single-tap rows get (1-w) + w at the same slot),
        and accumulation is f32 even for bf16 inputs.
      * CPU/GPU: the O(out) two-tap `jnp.take` lerp. The dense matmul
        would be O(out*in) per axis (a 1920->3840 flow upsample is
        ~100 GFLOP on CPU), which made golden generation and the CPU
        test suite pointlessly slow.

    Both paths implement the same align-corners formula with f32
    accumulation (agreement to float rounding; goldens run per-backend).
    """
    if not jnp.issubdtype(x.dtype, jnp.floating):
        raise TypeError(f"resize_bilinear needs float input, got {x.dtype}")
    in_size = x.shape[axis]
    if out_size == in_size:
        return x
    i0, i1, w1 = _axis_coeffs(in_size, out_size)
    axis = axis % x.ndim
    if jax.default_backend() != "tpu":
        a = jnp.take(x, jnp.asarray(i0), axis=axis)
        b = jnp.take(x, jnp.asarray(i1), axis=axis)
        wshape = [1] * x.ndim
        wshape[axis] = out_size
        w = jnp.asarray(w1, jnp.float32).reshape(wshape)
        y = a.astype(jnp.float32) * (1.0 - w) + b.astype(jnp.float32) * w
        return y.astype(x.dtype)
    iota = jnp.arange(in_size, dtype=jnp.int32)[None, :]          # [1, in]
    i0c = jnp.asarray(i0)[:, None]                                 # [out, 1]
    i1c = jnp.asarray(i1)[:, None]
    w = jnp.asarray(w1, jnp.float32)[:, None]
    m = (iota == i0c).astype(jnp.float32) * (1.0 - w) + (
        iota == i1c
    ).astype(jnp.float32) * w                                      # [out, in]
    y = jax.lax.dot_general(
        m.astype(x.dtype), x,
        dimension_numbers=(((1,), (axis,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [out, ...x-without-axis]
    return jnp.moveaxis(y, 0, axis).astype(x.dtype)


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
