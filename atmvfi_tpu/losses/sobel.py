"""4-direction Sobel edge-magnitude L1 loss (reference loss_fn/edge_loss.py)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_GX = np.array([[2.0, 0.0, -2.0], [4.0, 0.0, -4.0], [2.0, 0.0, -2.0]], np.float32)
_GY = np.array([[2.0, 4.0, 2.0], [0.0, 0.0, 0.0], [-2.0, -4.0, -2.0]], np.float32)
_G45 = np.array([[0.0, -2.0, -4.0], [2.0, 0.0, -2.0], [4.0, 2.0, 0.0]], np.float32)
_G135 = np.array([[-4.0, -2.0, 0.0], [-2.0, 0.0, 2.0], [0.0, 2.0, 4.0]], np.float32)
_KERNELS = np.stack([_GX, _GY, _G45, _G135], axis=-1)[:, :, None, :]  # HWIO [3,3,1,4]


def _rgb_to_y(img: jnp.ndarray) -> jnp.ndarray:
    return (
        0.299 * img[..., 0:1] + 0.587 * img[..., 1:2] + 0.114 * img[..., 2:3]
    )


def _sobel_mag(y: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    import jax

    k = jnp.asarray(_KERNELS, y.dtype)
    g = jax.lax.conv_general_dilated(
        y, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True) + eps)


def sobel_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """L1 between Sobel magnitudes of the Y channels; gt is non-diff."""
    import jax

    gt = jax.lax.stop_gradient(gt)
    return jnp.mean(jnp.abs(_sobel_mag(_rgb_to_y(pred)) - _sobel_mag(_rgb_to_y(gt))))
