"""Correctness + speed of the tile-slab warp kernel on TPU."""
import time
import numpy as np
import jax, jax.numpy as jnp
from atmvfi_tpu.ops import warp as warp_xla
from atmvfi_tpu.ops.warp_pallas import flow_warp_tiled

rng = np.random.default_rng(0)
B, H, W, C = 1, 256, 384, 3
feat = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
flow = jnp.asarray(rng.standard_normal((B, H, W, 2)) * 5, jnp.float32)
got = jax.jit(flow_warp_tiled)(feat, flow)
want = jax.jit(warp_xla.flow_warp)(feat, flow)
print("small f32 max diff:", float(jnp.abs(got - want).max()), flush=True)

# large flow -> fallback triggers
flow_big = jnp.asarray(rng.standard_normal((B, H, W, 2)) * 200, jnp.float32)
got2 = jax.jit(flow_warp_tiled)(feat, flow_big)
want2 = jax.jit(warp_xla.flow_warp)(feat, flow_big)
print("fallback f32 max diff:", float(jnp.abs(got2 - want2).max()), flush=True)

# speed at 1080p C=3 bf16
H, W = 1088, 1920
img = jnp.asarray(rng.random((1, H, W, C)), jnp.bfloat16)
fl = jnp.asarray(rng.standard_normal((1, H, W, 2)) * 10, jnp.bfloat16)
for name, f in [("pallas-tiled", jax.jit(flow_warp_tiled)), ("xla", jax.jit(warp_xla.flow_warp))]:
    out = f(img, fl); out.block_until_ready()
    t0 = time.time()
    for _ in range(20):
        out = f(img, fl)
    out.block_until_ready()
    print(f"{name} 1080p C=3: {(time.time()-t0)/20*1000:.2f} ms/warp", flush=True)
# 4K
H, W = 2176, 3840
img = jnp.asarray(rng.random((1, H, W, C)), jnp.bfloat16)
fl = jnp.asarray(rng.standard_normal((1, H, W, 2)) * 10, jnp.bfloat16)
for name, f in [("pallas-tiled", jax.jit(flow_warp_tiled)), ("xla", jax.jit(warp_xla.flow_warp))]:
    out = f(img, fl); out.block_until_ready()
    t0 = time.time()
    for _ in range(10):
        out = f(img, fl)
    out.block_until_ready()
    print(f"{name} 4K C=3: {(time.time()-t0)/10*1000:.2f} ms/warp", flush=True)
