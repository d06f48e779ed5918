"""Cross-scale feature fusion (reference network_base.py:34-85).

Downsamples finer pyramid scales to the coarsest with strided/dilated
plain convs, concatenates along channels, 1x1-projects and layer-norms.
NHWC throughout; returns a [B, Hc, Wc, fused_dim] feature map (the
reference flattens to tokens here; we keep the spatial form and let the
attention blocks partition it).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from atmvfi_tpu.models.initializers import msra_conv_init
from atmvfi_tpu.models.layers import LN_EPS


class CrossScaleFeatureFusion(nn.Module):
    in_dims: Tuple[int, ...]
    fused_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray]) -> jnp.ndarray:
        assert len(xs) == len(self.in_dims)
        ys = []
        k = 0
        n = len(self.in_dims)
        for i in range(n - 1):
            src = xs[-2 - i]
            feats = self.in_dims[-2 - i]
            for j in range(2**i):
                conv = nn.Conv(
                    feats,
                    (3, 3),
                    strides=2 ** (i + 1),
                    padding=[(1 + j, 1 + j)] * 2,
                    kernel_dilation=1 + j,
                    kernel_init=msra_conv_init(9 * feats),
                    dtype=self.dtype,
                    name=f"layers_{k}",
                )
                ys.append(conv(src))
                k += 1
        ys.append(xs[-1])
        x = jnp.concatenate(ys, axis=-1)
        x = nn.Conv(
            self.fused_dim,
            (1, 1),
            kernel_init=msra_conv_init(self.fused_dim),
            dtype=self.dtype,
            name="proj",
        )(x)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        return x
