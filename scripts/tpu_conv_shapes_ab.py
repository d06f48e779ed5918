"""Device A/B for the two remaining XLA-conv hotspots in the lite-4K
trace (2026-08-19, post flow-rework: conv bucket 117.9 ms):

  h1: refiner up2 conv 64->32 @ 1088x1920 — fusion.71 measured
      18.6 ms = 4 TF/s with a T(2,128) layout; HCW kernel candidate
  h2: decoder upsample0 conv 229->229 @ 544x960 — 14.1 ms = 35 TF/s
      (229 sits off the mod-128 cliff); candidates: channel-pad the
      XLA conv to 256, or the HCW kernel
  h3: up2 deconv 128->64 @ 544x960 -> 1088x1920 (fusion.1561 4.6 ms)

Run on the axon TPU: python -u scripts/tpu_conv_shapes_ab.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from atmvfi_tpu.ops import conv_pallas as cp
from atmvfi_tpu.ops import deconv_pallas as dp

print(f"device: {jax.devices()[0]}", flush=True)


def bench(tag, fn, *args, iters=20):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1e3
    print(f"  {tag}: {dt:7.2f} ms", flush=True)
    return dt


def conv_xla(x, k, b, pad_to=0):
    cin, cout = k.shape[2], k.shape[3]
    if pad_to:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_to - cin)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_to - cin),
                        (0, pad_to - cout)))
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (y[..., :cout] if pad_to else y) + b


def conv_hcw(x, k, b, slope):
    B, H, W, C = x.shape
    xh = cp.nhwc_to_hcw(x)
    y = cp.conv3x3_hcw_op(xh, k, b, slope, H, True, False)
    return cp.hcw_to_nhwc(y, B, k.shape[3], W)


def main():
    key = jax.random.PRNGKey(0)

    # ---- h1: 64->32 @ 1088x1920 ----
    ks = jax.random.split(key, 4)
    x1 = jax.random.uniform(ks[0], (1, 1088, 1920, 64), jnp.bfloat16)
    k1 = jax.random.uniform(ks[1], (3, 3, 64, 32), jnp.float32) * 0.1
    b1 = jnp.zeros((32,), jnp.float32)
    s1 = jnp.full((32,), 0.25, jnp.float32)
    print("h1 conv 64->32 @1088x1920 bf16 (77 GF):", flush=True)
    bench("xla nhwc           ", lambda x: conv_xla(x, k1, b1), x1)
    bench("xla nhwc pad128    ", lambda x: conv_xla(x, k1, b1, 128), x1)
    bench("hcw kernel (w/ t)  ", lambda x: conv_hcw(x, k1, b1, s1), x1)
    xh1 = cp.nhwc_to_hcw(x1)
    bench("hcw kernel (no t)  ",
          lambda xh: cp.conv3x3_hcw_op(xh, k1, b1, s1, 1088, True, False),
          xh1)

    # ---- h2: 229->229 @ 544x960 ----
    x2 = jax.random.uniform(ks[2], (1, 544, 960, 229), jnp.bfloat16)
    k2 = jax.random.uniform(ks[3], (3, 3, 229, 229), jnp.float32) * 0.05
    b2 = jnp.zeros((229,), jnp.float32)
    s2 = jnp.full((229,), 0.25, jnp.float32)
    print("h2 conv 229->229 @544x960 bf16 (493 GF):", flush=True)
    bench("xla nhwc           ", lambda x: conv_xla(x, k2, b2), x2)
    bench("xla nhwc pad256    ", lambda x: conv_xla(x, k2, b2, 256), x2)
    bench("hcw kernel (w/ t)  ", lambda x: conv_hcw(x, k2, b2, s2), x2)

    # ---- h3: deconv2x 128->64 @ 544x960 ----
    x3 = jax.random.uniform(ks[0], (1, 544, 960, 128), jnp.bfloat16)
    k3 = jax.random.uniform(ks[1], (2, 2, 128, 64), jnp.float32) * 0.1
    b3 = jnp.zeros((64,), jnp.float32)

    def deconv_xla(x):
        y = jax.lax.conv_transpose(
            x, k3[::-1, ::-1].astype(x.dtype), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b3.astype(x.dtype)

    def deconv_hcw(x):
        B, H, W, C = x.shape
        xh = cp.nhwc_to_hcw(x)
        y = dp.deconv2x_hcw_op(xh, k3, b3, None, False, False)
        return cp.hcw_to_nhwc(y, B, 64, 2 * W)

    print("h3 deconv 128->64 @544x960->1088x1920 bf16:", flush=True)
    bench("xla conv_transpose ", deconv_xla, x3)
    bench("hcw deconv (w/ t)  ", deconv_hcw, x3)


if __name__ == "__main__":
    main()


def frontier():
    """Channel-width frontier: HCW kernel (with entry+exit transposes)
    vs XLA NHWC, square convs at 544x960 bf16 — sets
    MAX_PROFITABLE_CH from data."""
    print("frontier conv CxC @544x960 bf16:", flush=True)
    key = jax.random.PRNGKey(1)
    for C in (96, 128, 160, 192, 229, 256, 320, 384, 448):
        ks = jax.random.split(jax.random.fold_in(key, C), 2)
        x = jax.random.uniform(ks[0], (1, 544, 960, C), jnp.bfloat16)
        k = jax.random.uniform(ks[1], (3, 3, C, C), jnp.float32) * 0.05
        b = jnp.zeros((C,), jnp.float32)
        s = jnp.full((C,), 0.25, jnp.float32)
        fits = cp.conv_run_fits(cp.lane_pad(960), [(C, C)], jnp.bfloat16)
        tx = bench(f"C={C:3d} xla  ", lambda xx: conv_xla(xx, k, b), x)
        if fits:
            th = bench(f"C={C:3d} hcw  ", lambda xx: conv_hcw(xx, k, b, s), x)
            print(f"    -> ratio xla/hcw = {tx/th:.2f}", flush=True)
        else:
            print(f"    C={C} hcw infeasible (VMEM)", flush=True)


if "--frontier" in sys.argv:
    frontier()
