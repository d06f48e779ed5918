"""Replicate the encoder first-stage HCW route standalone on TPU.

The demo loses 8 dB with this route on; single-kernel probes at the
exact shapes are exact. Cases:
  h1 kernel chain 3->24->24 HCW-in/HCW-out vs HIGHEST XLA chain
  h2 full route replica: NHWC in -> nhwc_to_hcw -> two kernels ->
     hcw_to_nhwc, vs HIGHEST XLA convs on NHWC
  h3 h2 with uniform [0,1] image-like input
"""
import sys

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from atmvfi_tpu.ops import conv_pallas as cp

B, H, W = 2, 1088, 2560
C0, C1 = 3, 24


def xla_conv(x, k, b, s, prelu=True):
    y = lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    ) + b
    if prelu:
        y = jnp.maximum(y, 0.0) + s * jnp.minimum(y, 0.0)
    return y


def params(key):
    ks = jax.random.split(key, 6)
    k1 = jax.random.normal(ks[0], (3, 3, C0, C1), jnp.float32) * 0.2
    b1 = jax.random.normal(ks[1], (C1,), jnp.float32) * 0.1
    s1 = jax.random.normal(ks[2], (C1,), jnp.float32) * 0.2
    k2 = jax.random.normal(ks[3], (3, 3, C1, C1), jnp.float32) * 0.2
    b2 = jax.random.normal(ks[4], (C1,), jnp.float32) * 0.1
    s2 = jax.random.normal(ks[5], (C1,), jnp.float32) * 0.2
    return k1, b1, s1, k2, b2, s2


def main():
    print("backend:", jax.default_backend(), flush=True)

    def h1(key):
        kk, kx = jax.random.split(key)
        k1, b1, s1, k2, b2, s2 = params(kk)
        x = jax.random.normal(kx, (B * H, 8, W), jnp.float32)
        ch = lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
        x = jnp.where(ch < C0, x, 0.0)
        y = cp.conv3x3_hcw_op(x, k1, b1, s1, H, True, False)
        y = cp.conv3x3_hcw_op(y, k2, b2, s2, H, True, False)
        xn = x[:, :C0, :].transpose(0, 2, 1).reshape(B, H, W, C0)
        yx = xla_conv(xla_conv(xn, k1, b1, s1), k2, b2, s2)
        yk = cp.hcw_to_nhwc(y, B, C1)
        d = jnp.abs(yk - yx)
        return jnp.max(d), jnp.mean(d)

    mx, mn = jax.jit(h1)(jax.random.PRNGKey(0))
    print(f"h1 chain 3->24->24 HCW: max={float(mx):.3e} "
          f"mean={float(mn):.3e}", flush=True)

    def route(x, k1, b1, s1, k2, b2, s2):
        xh = cp.nhwc_to_hcw(x)
        xh = cp.conv3x3_hcw_op(xh, k1, b1, s1, H, True, False)
        xh = cp.conv3x3_hcw_op(xh, k2, b2, s2, H, True, False)
        return cp.hcw_to_nhwc(xh, B, C1)

    def h2(key):
        kk, kx = jax.random.split(key)
        k1, b1, s1, k2, b2, s2 = params(kk)
        x = jax.random.normal(kx, (B, H, W, C0), jnp.float32)
        yk = route(x, k1, b1, s1, k2, b2, s2)
        yx = xla_conv(xla_conv(x, k1, b1, s1), k2, b2, s2)
        d = jnp.abs(yk - yx)
        return jnp.max(d), jnp.mean(d)

    mx, mn = jax.jit(h2)(jax.random.PRNGKey(1))
    print(f"h2 full route normal in: max={float(mx):.3e} "
          f"mean={float(mn):.3e}", flush=True)

    def h3(key):
        kk, kx = jax.random.split(key)
        k1, b1, s1, k2, b2, s2 = params(kk)
        x = jax.random.uniform(kx, (B, H, W, C0), jnp.float32)
        yk = route(x, k1, b1, s1, k2, b2, s2)
        yx = xla_conv(xla_conv(x, k1, b1, s1), k2, b2, s2)
        d = jnp.abs(yk - yx)
        return jnp.max(d), jnp.mean(d)

    mx, mn = jax.jit(h3)(jax.random.PRNGKey(2))
    print(f"h3 full route uniform in: max={float(mx):.3e} "
          f"mean={float(mn):.3e}", flush=True)


if __name__ == "__main__":
    main()
