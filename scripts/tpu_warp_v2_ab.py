"""A/B the tile-slab warp kernel inner-loop variants on device.

v2 replaces v1's static (q-block, sublane-offset) scan (~16-24
iterations/ch of 3 rolls + 6 gathers) with a dynamic-trip-count loop
over the tile's actual row spread (~2-4 iterations/ch of 1 whole-slab
roll + 6 gathers) — see ops/warp_pallas.py::_kernel_v2. v3 (round 4)
keeps the span loop but loads a 16-row window per span row instead of
rolling the whole (S, 384) slab, and folds the row-match masks + tap
weights once per row outside the channel loop (_kernel_v3) — about
half the VPU work of v2.

Sections:
  1. standalone: scan-chained warp at 4K C=3, smooth flow of varied
     magnitude (exactness cond included and excluded)
  2. exactness spot-check vs the XLA gather (same program)
  3. model-level: lite 4K, warp_impl tiled vs tiled_v2

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_warp_v2_ab.py
"""
import dataclasses
import time

import jax
import jax.numpy as jnp

from atmvfi_tpu.models import Network, get_config
from atmvfi_tpu.ops import warp as warp_xla
from atmvfi_tpu.ops.resize import resize_bilinear
from atmvfi_tpu.ops.warp_pallas import flow_warp_tiled

print(f"device: {jax.devices()[0]}", flush=True)

H, W = 2176, 3840
ITERS = 8


def smooth_flow(key, mag):
    coarse = jax.random.normal(key, (1, H // 64, W // 64, 2)) * mag
    return resize_bilinear(coarse, H, W)


k1, k2 = jax.random.split(jax.random.PRNGKey(0))
img = jax.jit(lambda k: jax.random.uniform(k, (1, H, W, 3), jnp.float32))(k1)

# --- 1. standalone chained warps ---
for mag in (4.0, 12.0):
    flow = jax.jit(smooth_flow, static_argnums=1)(k2, mag)

    for tag, kw in (
        ("v1 checked  ", dict(inner="scan")),
        ("v1 unchecked", dict(inner="scan", unchecked=True)),
        ("v2 checked  ", dict(inner="span")),
        ("v2 unchecked", dict(inner="span", unchecked=True)),
        ("v3 checked  ", dict(inner="win")),
        ("v3 unchecked", dict(inner="win", unchecked=True)),
    ):
        def chained(im, fl, kw=kw):
            def body(x, _):
                y = flow_warp_tiled(x, fl, **kw)
                return y, y.mean()

            _, m = jax.lax.scan(body, im, None, length=ITERS)
            return m.sum()

        cf = jax.jit(chained)
        float(cf(img, flow))
        t0 = time.time()
        float(cf(img, flow))
        dt = (time.time() - t0) / ITERS
        print(f"standalone mag={mag:4.1f} {tag}: {dt*1e3:7.2f} ms/warp",
              flush=True)

# --- 2. exactness spot-check (same program) ---
flow = jax.jit(smooth_flow, static_argnums=1)(k2, 6.0)


def check(im, fl, inner):
    a = flow_warp_tiled(im, fl, inner=inner)
    b = warp_xla.flow_warp(im, fl)
    d = jnp.abs(a - b)
    return jnp.max(d), jnp.mean(d)


for inner, tag in (("span", "v2"), ("win", "v3")):
    mx, mn = jax.jit(check, static_argnums=2)(img, flow, inner)
    print(f"{tag} vs XLA @4K: max={float(mx):.3e} mean={float(mn):.3e}",
          flush=True)

# --- 3. model level, lite 4K ---
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
MITERS = 4
for impl in ("tiled_v2", "tiled_v3"):
    net = Network(dataclasses.replace(base_cfg, warp_impl=impl))

    def chained(v, a, b):
        def body(tok, _):
            y = net.apply(v, a + tok, b, global_motion=True)["I_t"]
            return y[:1, :1, :1, :1] * 0.0, y.mean()

        _, m = jax.lax.scan(body, jnp.zeros((1, 1, 1, 1)), None,
                            length=MITERS)
        return m.sum()

    cf = jax.jit(chained)
    float(cf(variables, x0, x1))
    t0 = time.time()
    float(cf(variables, x0, x1))
    dt = (time.time() - t0) / MITERS
    print(f"lite 4K warp={impl:9s}: {dt*1e3:.1f} ms/frame = {1/dt:.2f} fps",
          flush=True)
