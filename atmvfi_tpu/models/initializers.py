"""Weight initializers reproducing the reference's init statistics.

Needed for train-from-scratch parity (SURVEY.md §7 hard part g):
  * `trunc_normal(std=.02)` for Linears inside transformer/fusion blocks
    (attention.py:101-114, network_base.py:58-71)
  * MSRA normal(0, sqrt(2/fan_out_per_group)) for convs inside blocks
    that apply `_init_weights`
  * PyTorch's default `kaiming_uniform(a=sqrt(5))` (i.e. U(±1/sqrt(fan_in)))
    for the plain conv/deconv helpers that are NOT covered by any
    `_init_weights` apply (network_base.py:20-32)
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def trunc_normal_init(std: float = 0.02):
    return jax.nn.initializers.truncated_normal(stddev=std)


def msra_conv_init(fan_out: int):
    """normal(0, sqrt(2/fan_out)); fan_out = kh*kw*out_ch/groups."""
    std = float(np.sqrt(2.0 / fan_out))
    return jax.nn.initializers.normal(stddev=std)


def torch_conv_kernel_init():
    """PyTorch Conv2d default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    For flax HWIO kernels, fan_in = kh * kw * in_per_group.
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in = int(np.prod(shape[:-1]))
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_conv_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def prelu_init(key, shape, dtype=jnp.float32):
    return jnp.full(shape, 0.25, dtype)
