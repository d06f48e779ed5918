"""Census (ternary) transform loss (reference loss_fn/census_loss.py).

7x7 census transform on the grayscale image, soft-normalized, soft
Hamming distance between the two transforms, masked to the valid
interior (1px border off). NHWC, jit-friendly.
"""
from __future__ import annotations

import jax.numpy as jnp

_PATCH = 7


def _rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0:1], rgb[..., 1:2], rgb[..., 2:3]
    return 0.2989 * r + 0.5870 * g + 0.1140 * b


def _census_transform(gray: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 1] -> [B, H, W, 49] of soft-normalized neighborhood diffs.

    Equivalent to the reference's conv with a 49-channel identity kernel
    (census_loss.py:12-22) — i.e. an extract-patches — done here as a
    pad + shifted-slice stack (pure data movement, VPU-friendly).
    """
    b, h, w, _ = gray.shape
    pad = _PATCH // 2
    padded = jnp.pad(gray, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    patches = [
        padded[:, dy : dy + h, dx : dx + w, 0]
        for dy in range(_PATCH)
        for dx in range(_PATCH)
    ]
    patches = jnp.stack(patches, axis=-1)  # [B, H, W, 49]
    transf = patches - gray
    return transf / jnp.sqrt(0.81 + transf**2)


def _soft_hamming(t1: jnp.ndarray, t2: jnp.ndarray) -> jnp.ndarray:
    dist = (t1 - t2) ** 2
    return jnp.mean(dist / (0.1 + dist), axis=-1, keepdims=True)


def _valid_mask(shape, padding: int, dtype) -> jnp.ndarray:
    b, h, w, _ = shape
    inner = jnp.ones((b, h - 2 * padding, w - 2 * padding, 1), dtype)
    return jnp.pad(inner, ((0, 0), (padding, padding), (padding, padding), (0, 0)))


def census_loss(img0: jnp.ndarray, img1: jnp.ndarray, reduce: str = "mean"):
    """Ternary.forward parity; NHWC [B, H, W, 3] in [0, 1]."""
    t0 = _census_transform(_rgb_to_gray(img0))
    t1 = _census_transform(_rgb_to_gray(img1))
    loss = _soft_hamming(t0, t1) * _valid_mask(img0.shape, 1, img0.dtype)
    if reduce == "mean":
        return jnp.mean(loss)
    return loss
