"""Validate + A/B the planar full-res tail on device (lite 4K).

Three sections:
  1. Mosaic compile + exactness of the two new kernels at model shapes
     (planes conv, planar warp) vs in-program XLA references
  2. full-model parity: tail_planar on vs off, same weights (bf16;
     expect agreement to bf16 noise)
  3. scan-chained throughput: tail off vs on (x warp v1/v2)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_planar_ab.py
"""
import dataclasses
import time

import jax
import jax.numpy as jnp

from atmvfi_tpu.models import Network, get_config
from atmvfi_tpu.ops import conv_pallas as cp
from atmvfi_tpu.ops.resize import resize_bilinear
from atmvfi_tpu.ops.warp_pallas import (
    flow_warp_tiled_planar,
    nhwc_to_planar,
)
from atmvfi_tpu.ops import warp as warp_xla

print(f"device: {jax.devices()[0]}", flush=True)
H, W = 2176, 3840
k1, k2 = jax.random.split(jax.random.PRNGKey(0))

# --- 1a. planes conv at the lite proj shape (bf16) ---


def planes_conv_check(key):
    ks = jax.random.split(key, 5)
    cf, np_, cout = 37, 15, 32
    feat = jax.random.normal(ks[0], (H, 48, W), jnp.bfloat16)
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 48, 1), 1)
    feat = jnp.where(ch < cf, feat, 0)
    planes = jax.random.uniform(ks[1], (np_, H, W), jnp.float32)
    k = jax.random.normal(ks[2], (3, 3, cf + np_, cout), jnp.float32) * 0.1
    b = jax.random.normal(ks[3], (cout,), jnp.float32) * 0.1
    s = jax.random.uniform(ks[4], (cout,), jnp.float32) * 0.5
    y = cp.conv3x3_hcw_planes_op(feat, planes, k, b, s, H, cf, True, False)
    ref = cp._xla_equiv_planes(feat, planes, k, b, s, H, cf, True)
    d = jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32))
    return jnp.max(d), jnp.mean(d)


mx, mn = jax.jit(planes_conv_check)(k1)
print(f"planes conv bf16 @4K: max={float(mx):.3e} mean={float(mn):.3e}",
      flush=True)

# --- 1b. planar warp at 4K (f32) ---


def planar_warp_check(key):
    ka, kb = jax.random.split(key)
    img = jax.random.uniform(ka, (1, H, W, 3), jnp.float32)
    coarse = jax.random.normal(kb, (1, H // 64, W // 64, 2)) * 6.0
    flow = resize_bilinear(coarse, H, W)
    p = nhwc_to_planar(img)
    got = flow_warp_tiled_planar(p, flow, 1)
    want = warp_xla.flow_warp(img, flow)
    want_p = want.reshape(H, W, 3).transpose(2, 0, 1)
    d = jnp.abs(got - want_p)
    return jnp.max(d), jnp.mean(d)


mx, mn = jax.jit(planar_warp_check)(k2)
print(f"planar warp f32 @4K: max={float(mx):.3e} mean={float(mn):.3e}",
      flush=True)

# --- 1c. stride-2 conv at the encoder stage-2 shape (bf16) ---


def s2_conv_check(key):
    ks = jax.random.split(key, 4)
    cin, cout = 16, 32
    x_hcw = jax.random.normal(ks[0], (2 * H, cin, W), jnp.bfloat16)
    k = jax.random.normal(ks[1], (3, 3, cin, cout), jnp.float32) * 0.1
    b = jax.random.normal(ks[2], (cout,), jnp.float32) * 0.1
    s = jax.random.uniform(ks[3], (cout,), jnp.float32) * 0.5
    y = cp.conv3x3s2_hcw_op(x_hcw, k, b, s, H // 2, True, False)
    ref = cp._xla_equiv_s2(x_hcw, k, b, s, H // 2, True)
    d = jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32))
    return jnp.max(d), jnp.mean(d)


mx, mn = jax.jit(s2_conv_check)(jax.random.PRNGKey(2))
print(f"s2 conv bf16 @4K 2B: max={float(mx):.3e} mean={float(mn):.3e}",
      flush=True)

# --- 2 + 3. full model: parity and throughput ---
base_cfg = get_config("lite", dtype=jnp.bfloat16)
dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
net0 = Network(base_cfg)
variables = jax.jit(
    lambda a, b: net0.init(jax.random.PRNGKey(0), a, b, global_motion=True)
)(dummy, dummy)
jax.block_until_ready(variables)

gen = jax.jit(lambda k1, k2: (
    jax.random.uniform(k1, (1, H, W, 3), jnp.float32),
    jnp.roll(jax.random.uniform(k1, (1, H, W, 3), jnp.float32),
             (8, -8), (1, 2)) * 0.7
    + 0.3 * jax.random.uniform(k2, (1, H, W, 3), jnp.float32),
))
x0, x1 = gen(k1, k2)

configs = [
    ("tail off, warp v1", base_cfg),
    ("tail ON,  warp v1", dataclasses.replace(base_cfg, tail_planar="on")),
    ("tail ON,  warp v2", dataclasses.replace(
        base_cfg, tail_planar="on", warp_impl="tiled_v2")),
]
ITERS = 4
ref_out = None
for tag, cfg in configs:
    net = Network(cfg)
    fwd = jax.jit(
        lambda v, a, b, net=net: net.apply(v, a, b, global_motion=True)["I_t"]
    )
    out = fwd(variables, x0, x1)
    if ref_out is None:
        ref_out = out

    def diffstat(a, b):
        d = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
        return jnp.max(d), jnp.mean(d)

    mx, mn = jax.jit(diffstat)(out, ref_out)
    print(f"{tag}: vs-off max={float(mx):.3e} mean={float(mn):.3e}",
          flush=True)

    def chained(v, a, b, net=net):
        def body(tok, _):
            y = net.apply(v, a + tok, b, global_motion=True)["I_t"]
            return y[:1, :1, :1, :1] * 0.0, y.mean()

        _, m = jax.lax.scan(body, jnp.zeros((1, 1, 1, 1)), None,
                            length=ITERS)
        return m.sum()

    cf = jax.jit(chained)
    float(cf(variables, x0, x1))
    t0 = time.time()
    float(cf(variables, x0, x1))
    dt = (time.time() - t0) / ITERS
    print(f"{tag}: {dt*1e3:.1f} ms/frame = {1/dt:.2f} fps", flush=True)
