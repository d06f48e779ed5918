"""Attribute the chained-conv divergence: kernel side or XLA side?

g1: program A computes y_mid = pallas_conv1(x) (known exact).
g2: program B, SINGLE pallas_conv2(y_mid) vs XLA equiv  -> known exact.
g3: program C, chained pallas_conv2(pallas_conv1(x)):
      y_chain vs g2's y_k2      -> does program structure change MY kernel?
      yx_chain vs g2's yx2      -> does it change XLA's conv?
g4: chain both sides vs an explicit precision=HIGHEST XLA chain:
      which of (kernel chain, default-XLA chain) is the degraded one?
"""
import sys

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from atmvfi_tpu.ops import conv_pallas as cp
from scripts.tpu_chain_probe import build

BH, H, CT, W = 768, 768, 101, 1280


def xla_hi(x_hcw, k_hwio, bias, slope, Hh, prelu):
    BHh, cpad, Wp = x_hcw.shape
    B = BHh // Hh
    cin, cout = k_hwio.shape[2], k_hwio.shape[3]
    xn = x_hcw[:, :cin, :].transpose(0, 2, 1).reshape(B, Hh, Wp, cin)
    y = lax.conv_general_dilated(
        xn, k_hwio.astype(xn.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    ) + bias.astype(jnp.float32)
    if prelu:
        s = slope.astype(y.dtype)
        y = jnp.maximum(y, 0.0) + s * jnp.minimum(y, 0.0)
    y = y.astype(x_hcw.dtype)
    coutp = cp.channel_pad(cout, x_hcw.dtype)
    if coutp != cout:
        y = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, coutp - cout)))
    return y.reshape(BHh, Wp, coutp).transpose(0, 2, 1)


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(3)

    @jax.jit
    def prog_a(k):
        x, k1, b1, s1, k2, b2 = build(BH, H, CT, W, k)
        return x, cp.conv3x3_hcw_op(x, k1, b1, s1, H, True, False)

    x, y_mid = prog_a(key)
    print("g1 done", flush=True)

    @jax.jit
    def prog_b(k, ym):
        _, k1, b1, s1, k2, b2 = build(BH, H, CT, W, k)
        z = jnp.zeros_like(b2)
        y_k2 = cp.conv3x3_hcw_op(ym, k2, b2, z, H, False, False)
        yx2 = cp._xla_equiv(ym, k2, b2, z, H, False)
        return y_k2, yx2

    y_k2, yx2 = prog_b(key, y_mid)
    st = jax.jit(lambda a, b: (jnp.max(jnp.abs(a - b)),
                               jnp.mean(jnp.abs(a - b))))
    mx, mn = st(y_k2, yx2)
    print(f"g2 single-call k2 vs xla2 (same input): max={float(mx):.3e} "
          f"mean={float(mn):.3e}", flush=True)

    @jax.jit
    def prog_c(k):
        x, k1, b1, s1, k2, b2 = build(BH, H, CT, W, k)
        z = jnp.zeros_like(b2)
        y1 = cp.conv3x3_hcw_op(x, k1, b1, s1, H, True, False)
        y_chain = cp.conv3x3_hcw_op(y1, k2, b2, z, H, False, False)
        yx1 = cp._xla_equiv(x, k1, b1, s1, H, True)
        yx_chain = cp._xla_equiv(yx1, k2, b2, z, H, False)
        yhi1 = xla_hi(x, k1, b1, s1, H, True)
        yhi = xla_hi(yhi1, k2, b2, z, H, False)
        return y_chain, yx_chain, yhi

    y_chain, yx_chain, yhi = prog_c(key)
    mx, mn = st(y_chain, y_k2)
    print(f"g3a kernel chain vs kernel single-prog: max={float(mx):.3e} "
          f"mean={float(mn):.3e}", flush=True)
    mx, mn = st(yx_chain, yx2)
    print(f"g3b xla chain vs xla single-prog:       max={float(mx):.3e} "
          f"mean={float(mn):.3e}", flush=True)
    mx, mn = st(y_chain, yhi)
    print(f"g4a kernel chain vs HIGHEST chain:      max={float(mx):.3e} "
          f"mean={float(mn):.3e}", flush=True)
    mx, mn = st(yx_chain, yhi)
    print(f"g4b xla default chain vs HIGHEST chain: max={float(mx):.3e} "
          f"mean={float(mn):.3e}", flush=True)


if __name__ == "__main__":
    main()
