"""Loss functions (all NHWC, jit-friendly)."""

import jax.numpy as jnp

from atmvfi_tpu.losses.census import census_loss
from atmvfi_tpu.losses.laplacian import lap_loss, laplacian_pyramid
from atmvfi_tpu.losses.pose import PoseLoss
from atmvfi_tpu.losses.sobel import sobel_loss
from atmvfi_tpu.losses.vgg import VGGPerceptualLoss, export_vgg16_npz


def charbonnier_loss(pred, label, eps: float = 1e-6):
    """L1 with Charbonnier smoothing (reference trainer.py:132-133)."""
    return jnp.mean(jnp.sqrt((pred - label) ** 2 + eps))


__all__ = [
    "census_loss",
    "charbonnier_loss",
    "lap_loss",
    "laplacian_pyramid",
    "PoseLoss",
    "sobel_loss",
    "VGGPerceptualLoss",
    "export_vgg16_npz",
]
