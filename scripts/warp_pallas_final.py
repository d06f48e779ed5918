import time
import numpy as np
import jax, jax.numpy as jnp
from atmvfi_tpu.ops import warp as warp_xla
from atmvfi_tpu.ops.resize import resize_bilinear
from atmvfi_tpu.ops.warp_pallas import flow_warp_tiled

rng = np.random.default_rng(0)

def smooth_flow(B, H, W, mag, seed=0):
    r = np.random.default_rng(seed)
    coarse = r.standard_normal((B, max(H//64,1), max(W//64,1), 2)).astype(np.float32) * mag
    return np.asarray(resize_bilinear(jnp.asarray(coarse), H, W))

# correctness battery
cases = [
    ("smooth", 1, 256, 384, 3, lambda B,H,W: smooth_flow(B,H,W,6.0,1)),
    ("smooth-large", 1, 256, 384, 3, lambda B,H,W: smooth_flow(B,H,W,25.0,2)),
    ("batch2", 2, 128, 384, 3, lambda B,H,W: smooth_flow(B,H,W,5.0,3)),
    ("const-big", 1, 256, 384, 3, lambda B,H,W: np.full((B,H,W,2), 77.3, np.float32)),
    ("random-fallback", 1, 256, 384, 3, lambda B,H,W: np.random.default_rng(4).standard_normal((B,H,W,2)).astype(np.float32)*60),
    ("feat-C24", 1, 128, 384, 24, lambda B,H,W: smooth_flow(B,H,W,4.0,5)),
]
for name, B, H, W, C, ffn in cases:
    feat = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    fl = jnp.asarray(ffn(B, H, W))
    got = jax.jit(flow_warp_tiled)(feat, fl)
    want = jax.jit(warp_xla.flow_warp)(feat, fl)
    print(f"{name}: max diff {float(jnp.abs(got-want).max()):.2e}", flush=True)

# speed, smooth flows, bf16 images
for H, W in [(1088, 1920), (2176, 3840)]:
    img = jnp.asarray(rng.random((1, H, W, 3)), jnp.bfloat16)
    fls = [jnp.asarray(smooth_flow(1, H, W, 8.0, s)) for s in range(10)]
    for name, f in [("pallas-tiled", jax.jit(flow_warp_tiled)), ("xla", jax.jit(warp_xla.flow_warp))]:
        out = f(img, fls[0]); out.block_until_ready()
        t0 = time.time()
        outs = [f(img, fl) for fl in fls]
        jax.block_until_ready(outs)
        print(f"{name} {H}x{W} C=3: {(time.time()-t0)/10*1000:.2f} ms/warp", flush=True)
# feature warp speed C=24 at 1/2 res
H, W = 1088, 1920
img = jnp.asarray(rng.random((1, H, W, 24)), jnp.bfloat16)
fls = [jnp.asarray(smooth_flow(1, H, W, 8.0, s)) for s in range(10)]
for name, f in [("pallas-tiled", jax.jit(flow_warp_tiled)), ("xla", jax.jit(warp_xla.flow_warp))]:
    out = f(img, fls[0]); out.block_until_ready()
    t0 = time.time()
    outs = [f(img, fl) for fl in fls]
    jax.block_until_ready(outs)
    print(f"{name} {H}x{W} C=24: {(time.time()-t0)/10*1000:.2f} ms/warp", flush=True)
