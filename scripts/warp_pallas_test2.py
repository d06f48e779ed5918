"""Slab-warp kernel with REALISTIC smooth flows (fast path actually taken)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from atmvfi_tpu.ops import warp as warp_xla
from atmvfi_tpu.ops.resize import resize_bilinear
from atmvfi_tpu.ops.warp_pallas import flow_warp_tiled

rng = np.random.default_rng(0)

def smooth_flow(B, H, W, mag):
    coarse = rng.standard_normal((B, H//64, W//64, 2)).astype(np.float32) * mag
    return np.asarray(resize_bilinear(jnp.asarray(coarse), H, W))

# correctness of the FAST path (smooth flow, f32)
B, H, W, C = 1, 256, 384, 3
feat = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
fl = jnp.asarray(smooth_flow(B, H, W, 6.0))
got = jax.jit(flow_warp_tiled)(feat, fl)
want = jax.jit(warp_xla.flow_warp)(feat, fl)
print("fast-path f32 max diff:", float(jnp.abs(got-want).max()), flush=True)

# check ok-rate for this flow (is fast path live?)
from atmvfi_tpu.ops.warp_pallas import _tile_minmax, TILE_H, TILE_W
# speed with smooth flows
for H, W in [(1088, 1920), (2176, 3840)]:
    img = jnp.asarray(rng.random((1, H, W, C)), jnp.bfloat16)
    fl = jnp.asarray(smooth_flow(1, H, W, 8.0), jnp.float32)
    for name, f in [("pallas-tiled", jax.jit(flow_warp_tiled)), ("xla", jax.jit(warp_xla.flow_warp))]:
        out = f(img, fl); out.block_until_ready()
        t0 = time.time()
        for _ in range(20):
            out = f(img, fl)
        out.block_until_ready()
        print(f"{name} {H}x{W} C=3 smooth: {(time.time()-t0)/20*1000:.2f} ms/warp", flush=True)
