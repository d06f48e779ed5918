"""VGG16 perceptual + Gram-style loss (reference loss_fn/vgg_loss.py:169-229).

The reference pulls pretrained torchvision VGG16 weights at
construction. This environment has no torchvision and zero egress, so
the feature extractor is implemented natively in JAX and the weights
are loaded from a user-provided `.npz` export (`export_vgg16_npz` shows
the expected layout). When no weights are available the loss degrades
gracefully (raises at construction with a clear message; the trainer
gates it behind config flags like the reference's switchboard).

Feature taps match `vgg16.features[:4] / [4:9] / [9:16] / [16:23]`:
relu1_2, relu2_2, relu3_3, relu4_3.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan up to relu4_3: (name, out_ch); 'M' = 2x2 maxpool
_VGG16_PLAN: Tuple = (
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512),
)
# block boundaries measured in conv count: relu1_2 | relu2_2 | relu3_3 | relu4_3
_BLOCK_ENDS = ("conv1_2", "conv2_2", "conv3_3", "conv4_3")

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def export_vgg16_npz(out_path: str) -> None:  # pragma: no cover
    """Helper to run on a machine WITH torchvision: export the weights."""
    import torch
    import torchvision

    feats = torchvision.models.vgg16(
        weights=torchvision.models.VGG16_Weights.DEFAULT
    ).features
    arrays = {}
    conv_idx = 0
    names = [p[0] for p in _VGG16_PLAN if isinstance(p, tuple)]
    for layer in feats:
        if isinstance(layer, torch.nn.Conv2d) and conv_idx < len(names):
            n = names[conv_idx]
            arrays[f"{n}.kernel"] = (
                layer.weight.detach().numpy().transpose(2, 3, 1, 0)
            )
            arrays[f"{n}.bias"] = layer.bias.detach().numpy()
            conv_idx += 1
    np.savez(out_path, **arrays)


def load_vgg16_features(npz_path: str):
    """Load an exported npz -> list of (kernel HWIO, bias) in plan order."""
    data = np.load(npz_path)
    weights = []
    for p in _VGG16_PLAN:
        if p == "M":
            continue
        n = p[0]
        weights.append((jnp.asarray(data[f"{n}.kernel"]), jnp.asarray(data[f"{n}.bias"])))
    return weights


def _vgg_features(x: jnp.ndarray, weights) -> List[jnp.ndarray]:
    """Run VGG16 up to relu4_3, returning the 4 block activations."""
    taps = []
    wi = 0
    for p in _VGG16_PLAN:
        if p == "M":
            x = -jax.lax.reduce_window(
                -x, jnp.inf, jax.lax.min, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        name, _ = p
        k, b = weights[wi]
        wi += 1
        x = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(x.dtype)
        x = jax.nn.relu(x)
        if name in _BLOCK_ENDS:
            taps.append(x)
    return taps


class VGGPerceptualLoss:
    """Callable (pred, target) -> (perceptual_loss, style_loss).

    Parity with VGGPerceptualLoss.forward (vgg_loss.py:202-229):
    ImageNet-normalize, run both images through the 4 blocks, L1 on
    activations + MSE on Gram matrices.
    """

    def __init__(self, npz_path: str, do_normalize: bool = True,
                 use_perceptual_loss: bool = True, use_style_loss: bool = True):
        self.weights = load_vgg16_features(npz_path)
        self.do_normalize = do_normalize
        self.use_perceptual_loss = use_perceptual_loss
        self.use_style_loss = use_style_loss

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray):
        target = jax.lax.stop_gradient(target)
        if self.do_normalize:
            mean = jnp.asarray(_IMAGENET_MEAN, pred.dtype)
            std = jnp.asarray(_IMAGENET_STD, pred.dtype)
            pred = (pred - mean) / std
            target = (target - mean) / std
        fx = _vgg_features(pred, self.weights)
        fy = _vgg_features(target, self.weights)
        perceptual = 0.0
        style = 0.0
        for x, y in zip(fx, fy):
            if self.use_perceptual_loss:
                perceptual = perceptual + jnp.mean(jnp.abs(x - y))
            if self.use_style_loss:
                b, h, w, c = x.shape
                ax = x.reshape(b, h * w, c)
                ay = y.reshape(b, h * w, c)
                gx = jnp.einsum("bnc,bnd->bcd", ax, ax)
                gy = jnp.einsum("bnc,bnd->bcd", ay, ay)
                style = style + jnp.mean((gx - gy) ** 2)
        return perceptual, style
