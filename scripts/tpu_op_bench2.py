import time, numpy as np, functools
import jax, jax.numpy as jnp
from atmvfi_tpu import ops

def timeit(name, fn, x, *args, n=10):
    out = fn(x, *args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        x = fn(x, *args)   # chain: next input = prev output
    jax.block_until_ready(x)
    print(f"{name:45s} {(time.time()-t0)/n*1000:8.2f} ms", flush=True)

rng = np.random.default_rng(0)
# calibration: 8192^3 matmul bf16 = 1.1 TFLOP
a = jnp.asarray(rng.random((8192, 8192)), jnp.bfloat16)
mm = jax.jit(lambda x: (x @ a).astype(jnp.bfloat16))
timeit("matmul 8192^3 bf16 (1.1 TFLOP)", mm, a)

H, W = 2176, 3840
for C in (3, 24):
    img = jnp.asarray(rng.random((1, H, W, C)), jnp.bfloat16)
    flow = jnp.asarray(rng.random((1, H, W, 2)) * 20 - 10, jnp.bfloat16)
    f = jax.jit(lambda im, fl: ops.flow_warp(im, fl))
    # chain via img: warp output feeds next warp
    timeit(f"flow_warp {H}x{W} C={C} bf16", f, img, flow)

img = jnp.asarray(rng.random((2, H, W, 24)), jnp.bfloat16)
k = jnp.asarray(rng.random((3,3,24,24)), jnp.bfloat16)
conv = jax.jit(lambda x, k: jax.lax.conv_general_dilated(x, k, (1,1), [(1,1),(1,1)], dimension_numbers=('NHWC','HWIO','NHWC')).astype(jnp.bfloat16))
timeit("conv3x3 24->24 @4K 2B bf16 (333GFLOP)", conv, img, k)

x3 = jnp.asarray(rng.random((1, H, W, 3)), jnp.bfloat16)
down = jax.jit(lambda x: jnp.pad(ops.downsample_2x(x), ((0,0),(0,H//2),(0,W//2),(0,0))))  # keep shape for chaining? no—use non-chained single
# simple: measure with independent outputs, but force n sequential by summing
def rep(fn, x, n=10):
    outs = fn(x); jax.block_until_ready(outs)
    t0=time.time()
    y = x
    for _ in range(n):
        y = fn(y) * 0 + x  # dependency chain, same shape
    jax.block_until_ready(y)
    return (time.time()-t0)/n*1000
