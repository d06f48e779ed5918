"""Window partition / reverse, center-padding and attention masks.

Functional equivalents of the reference window utilities
(/root/reference/network/attention.py:8-71) and of the shifted-window
mask construction that the reference caches in mutable buffers at first
forward (attention.py:275-305). Because JAX traces with static shapes,
every mask here is precomputed in numpy at trace time (keyed on
(H, W, window, shift)) and becomes an XLA constant — same math, no
mutable state, no resolution-keyed cache invalidation bugs.

Layouts: features are [B, H, W, C]; windows are [B * nH * nW, wh*ww, C].
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

MASK_NEG = -100.0  # additive mask value used by the reference


def to_2tuple(v):
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


def window_partition(x: jnp.ndarray, window_size) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nH*nW, wh*ww, C]. Parity: attention.py:8-14."""
    wh, ww = to_2tuple(window_size)
    B, H, W, C = x.shape
    x = x.reshape(B, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh * ww, C)


def window_reverse(windows: jnp.ndarray, window_size, H: int, W: int) -> jnp.ndarray:
    """[B*nH*nW, wh*ww, C] -> [B, H, W, C]. Parity: attention.py:17-25."""
    wh, ww = to_2tuple(window_size)
    nwB, N, C = windows.shape
    B = nwB // ((H // wh) * (W // ww))
    x = windows.reshape(B, H // wh, W // ww, wh, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def pad_amounts(h: int, w: int, window_size) -> Tuple[int, int]:
    wh, ww = to_2tuple(window_size)
    pad_h = math.ceil(h / wh) * wh - h
    pad_w = math.ceil(w / ww) * ww - w
    return pad_h, pad_w


def center_pad(x: jnp.ndarray, window_size) -> jnp.ndarray:
    """Center-pad H, W to a multiple of the window (attention.py:58-61)."""
    _, h, w, _ = x.shape
    pad_h, pad_w = pad_amounts(h, w, window_size)
    if pad_h == 0 and pad_w == 0:
        return x
    return jnp.pad(
        x,
        (
            (0, 0),
            (pad_h // 2, pad_h - pad_h // 2),
            (pad_w // 2, pad_w - pad_w // 2),
            (0, 0),
        ),
    )


def center_depad(x: jnp.ndarray, h: int, w: int, window_size) -> jnp.ndarray:
    """Remove center padding (attention.py:65-71)."""
    pad_h, pad_w = pad_amounts(h, w, window_size)
    if pad_h == 0 and pad_w == 0:
        return x
    return x[:, pad_h // 2 : pad_h // 2 + h, pad_w // 2 : pad_w // 2 + w, :]


def _np_window_partition(x: np.ndarray, wh: int, ww: int) -> np.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh * ww, C)


def _region_mask(labels: np.ndarray, wh: int, ww: int) -> np.ndarray:
    """Pairwise same-region additive mask from a [1,H,W,1] label image."""
    win = _np_window_partition(labels, wh, ww)[..., 0]  # [nW, N]
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, np.float32(MASK_NEG), np.float32(0.0))


@functools.lru_cache(maxsize=256)
def _pad_mask_np(h: int, w: int, wh: int, ww: int) -> Optional[np.ndarray]:
    """Pad-region attention mask, or None when no padding is needed.

    Parity: pad_if_needed mask construction (attention.py:32-57): the
    padded canvas is labeled with 9 center-pad regions and cross-region
    attention is masked with -100.
    """
    pad_h = math.ceil(h / wh) * wh - h
    pad_w = math.ceil(w / ww) * ww - w
    if pad_h == 0 and pad_w == 0:
        return None
    labels = np.zeros((1, h + pad_h, w + pad_w, 1), np.float32)
    h_sl = (slice(0, pad_h // 2), slice(pad_h // 2, h + pad_h // 2), slice(h + pad_h // 2, None))
    w_sl = (slice(0, pad_w // 2), slice(pad_w // 2, w + pad_w // 2), slice(w + pad_w // 2, None))
    cnt = 0
    for hs in h_sl:
        for ws in w_sl:
            labels[:, hs, ws, :] = cnt
            cnt += 1
    return _region_mask(labels, wh, ww)


@functools.lru_cache(maxsize=256)
def _shift_mask_np(
    h: int, w: int, wh: int, ww: int, sh: int, sw: int
) -> Optional[np.ndarray]:
    """Combined shifted-window + pad mask on the padded canvas.

    Parity: the in-forward shift-mask construction of ATMFormer /
    RefineBottleneck (attention.py:275-305, 443-473) including the
    `masked_fill(pad_mask != 0, -100)` merge.
    """
    pad_h = math.ceil(h / wh) * wh - h
    pad_w = math.ceil(w / ww) * ww - w
    hp, wp = h + pad_h, w + pad_w
    if sh == 0 and sw == 0:
        return _pad_mask_np(h, w, wh, ww)
    labels = np.zeros((1, hp, wp, 1), np.float32)
    h_sl = (slice(0, -wh), slice(-wh, -sh), slice(-sh, None))
    w_sl = (slice(0, -ww), slice(-ww, -sw), slice(-sw, None))
    cnt = 0
    for hs in h_sl:
        for ws in w_sl:
            labels[:, hs, ws, :] = cnt
            cnt += 1
    mask = _region_mask(labels, wh, ww)
    pad_mask = _pad_mask_np(h, w, wh, ww)
    if pad_mask is not None:
        mask = np.where(pad_mask != 0, np.float32(MASK_NEG), mask)
    return mask


@functools.lru_cache(maxsize=64)
def _relative_coords_np(window_size: int) -> np.ndarray:
    """[2, N, N] with rel[d, q, k] = key_d - query_d (in-window offsets).

    Parity: AttentionToMotion._register_relative_coord_
    (attention.py:150-165) — channel 0 is x offsets, channel 1 is y.
    """
    n = window_size
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="xy")
    coords = np.stack([xs.reshape(-1), ys.reshape(-1)], axis=0).astype(np.float32)
    # rel[d, q, k] = coords[d, k] - coords[d, q]
    return coords[:, None, :] - coords[:, :, None]


def relative_coords(window_size: int) -> jnp.ndarray:
    return jnp.asarray(_relative_coords_np(window_size))


def attn_mask_for(
    h: int, w: int, window_size, shift_size
) -> Optional[jnp.ndarray]:
    """Additive attention mask [nW, N, N] for a (resolution, window, shift).

    Returns None when neither padding nor shifting requires masking.
    Static per trace; becomes an XLA constant.
    """
    wh, ww = to_2tuple(window_size)
    sh, sw = to_2tuple(shift_size)
    m = _shift_mask_np(h, w, wh, ww, sh, sw)
    return None if m is None else jnp.asarray(m)
