"""Divisible-by-N replicate padding for arbitrary input sizes.

NHWC equivalent of the benchmark `InputPadder`
(/root/reference/benchmark/utils.py:57-80): pads H and W up to the next
multiple of `divisor` with replicate (edge) padding, split center-ish
(floor on top/left), and can undo it.
"""
from __future__ import annotations

import jax.numpy as jnp


class InputPadder:
    def __init__(self, dims, divisor: int = 16):
        # dims: NHWC shape tuple
        self.ht, self.wd = dims[-3], dims[-2]
        pad_ht = (((self.ht // divisor) + 1) * divisor - self.ht) % divisor
        pad_wd = (((self.wd // divisor) + 1) * divisor - self.wd) % divisor
        self._pad = (pad_wd // 2, pad_wd - pad_wd // 2,
                     pad_ht // 2, pad_ht - pad_ht // 2)

    @property
    def padded_shape(self):
        return (self.ht + self._pad[2] + self._pad[3],
                self.wd + self._pad[0] + self._pad[1])

    def pad(self, *inputs):
        l, r, t, b = self._pad
        outs = [
            jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")
            for x in inputs
        ]
        return outs[0] if len(outs) == 1 else outs

    def unpad(self, *inputs):
        l, r, t, b = self._pad
        outs = []
        for x in inputs:
            ht, wd = x.shape[-3], x.shape[-2]
            outs.append(x[..., t : ht - b, l : wd - r, :])
        return outs[0] if len(outs) == 1 else outs
