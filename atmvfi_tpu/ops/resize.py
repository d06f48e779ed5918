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
from typing import Optional

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


def _resize_h_rows(x, out_size: int, row0, out_len: int,
                   in_row0=0, in_size: Optional[int] = None):
    """Rows [row0, row0 + out_len) of the H-axis align-corners resize
    to `out_size`, computed from x's rows which cover the GLOBAL input
    rows [in_row0, in_row0 + x.shape[-3]) of a virtual full input of
    `in_size` rows. row0/in_row0 may be traced (the spatial serving
    schedule's slab offsets); out_len and all sizes are static. Row-
    for-row equal (to f32 rounding of the source-coordinate formula —
    the static path computes it in f64) to
    resize_bilinear(x_full, out_size, W)[..., row0:row0+out_len, :, :].

    The caller must guarantee the needed input band lies inside x:
    each output row reads input rows floor/ceil of
    r*(in-1)/(out-1) — for the x2 upsampling chain a +-2-row pad per
    level suffices."""
    in_have = x.shape[-3]
    if in_size is None:
        in_size = in_have
    rows = jnp.asarray(row0, jnp.int32) + jnp.arange(out_len,
                                                     dtype=jnp.int32)
    if out_size == 1:
        i0 = jnp.zeros((out_len,), jnp.int32)
        w = jnp.zeros((out_len, 1), jnp.float32)
    else:
        # src = rows*(in-1)/(out-1) via exact integer divmod: the
        # integer part is exact and the fractional part is < 1, where
        # f32 rounding is ~6e-8 absolute — a straight f32 product
        # loses ~2e-5 at 4K row indices (visible at 4e-4 in flows)
        num = rows * (in_size - 1)
        den = out_size - 1
        q = num // den
        rem = num - q * den
        i0 = jnp.clip(q, 0, in_size - 1)
        w = (rem.astype(jnp.float32) / float(den))[:, None]
    i1 = jnp.clip(i0 + 1, 0, in_size - 1)
    axis = x.ndim - 3
    rel0 = jnp.clip(i0 - jnp.asarray(in_row0), 0, in_have - 1)
    rel1 = jnp.clip(i1 - jnp.asarray(in_row0), 0, in_have - 1)
    if jax.default_backend() != "tpu":
        # mirror _resize_axis's CPU two-tap lerp so the row form tracks
        # the static path to w's f32 rounding (~1e-5 after the chain's
        # x8 flow scaling), not the dot-vs-lerp f32 band (~1e-4)
        a = jnp.take(x, rel0, axis=axis)
        b = jnp.take(x, rel1, axis=axis)
        wshape = [1] * x.ndim
        wshape[axis] = out_len
        wb = w.reshape(wshape)
        y = a.astype(jnp.float32) * (1.0 - wb) + b.astype(jnp.float32) * wb
        return y.astype(x.dtype)
    iota = jnp.arange(in_have, dtype=jnp.int32)[None, :]
    m = (iota == rel0[:, None]).astype(jnp.float32) * (1.0 - w) + (
        iota == rel1[:, None]
    ).astype(jnp.float32) * w                       # [out_len, in_have]
    y = jax.lax.dot_general(
        m.astype(x.dtype), x,
        dimension_numbers=(((1,), (axis,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.moveaxis(y, 0, axis).astype(x.dtype)


def upsample_flow_rows(flow, levels: int, row0, out_len: int):
    """Rows [row0, row0 + out_len) of
    upsample_flow(...upsample_flow(flow, 2)..., 2) applied `levels`
    times — the progressive x2 chain of the global-flow upsample
    (network.py serving loop) computed only at the needed output rows.
    flow: the FULL coarse flow [..., h, w, 2]; row0 traced; out_len
    static (out_len and row0 are FULL-RES rows; out_len % 2**levels
    == 0). Each intermediate level keeps a +-2-row band so the next
    level's taps stay in range; W-axis resizes are full-width static.
    """
    h = flow.shape[-3]
    w = flow.shape[-2]
    sizes = [h * 2**k for k in range(levels + 1)]
    # level k slab: rows [r_k, r_k + len_k) of the virtual full level
    lens = [out_len]
    for _ in range(levels - 1):
        lens.insert(0, lens[0] // 2 + 4)
    cur = flow
    cur_row0 = jnp.zeros((), jnp.int32)
    cur_size = h
    for k in range(levels):
        out_size = sizes[k + 1]
        ln = lens[k]
        if k == levels - 1:
            r0 = jnp.asarray(row0, jnp.int32)
        else:
            # center the band over the rows the NEXT level will read
            r0 = jnp.clip(
                jnp.asarray(row0, jnp.int32) // 2 ** (levels - 1 - k) - 2,
                0, out_size - ln,
            )
        cur = _resize_h_rows(cur, out_size, r0, ln, cur_row0, cur_size)
        cur = _resize_axis(cur, cur.ndim - 2, w * 2 ** (k + 1)) * 2.0
        cur_row0, cur_size = r0, out_size
    return cur


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
