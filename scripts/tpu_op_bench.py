import time, numpy as np, functools
import jax, jax.numpy as jnp
from atmvfi_tpu import ops

def timeit(name, fn, *args, n=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:45s} {(time.time()-t0)/n*1000:8.2f} ms", flush=True)

H, W = 2176, 3840
rng = np.random.default_rng(0)
for C in (3, 24):
    img = jnp.asarray(rng.random((1, H, W, C)), jnp.bfloat16)
    flow = jnp.asarray(rng.random((1, H, W, 2)) * 20 - 10, jnp.bfloat16)
    f = jax.jit(ops.flow_warp)
    timeit(f"flow_warp {H}x{W} C={C} bf16", f, img, flow)

img = jnp.asarray(rng.random((1, H, W, 3)), jnp.bfloat16)
timeit("downsample_2x 4K C=3", jax.jit(ops.downsample_2x), img)
flow8 = jnp.asarray(rng.random((1, H//8, W//8, 2)), jnp.bfloat16)
timeit("upsample_flow 1/8->1/4", jax.jit(functools.partial(ops.upsample_flow, factor=2)), flow8)

# conv stage0 for scale
k = jnp.asarray(rng.random((3,3,24,24)), jnp.bfloat16)
x24 = jnp.asarray(rng.random((1, H, W, 24)), jnp.bfloat16)
conv = jax.jit(lambda x, k: jax.lax.conv_general_dilated(x, k, (1,1), [(1,1),(1,1)], dimension_numbers=('NHWC','HWIO','NHWC')))
timeit("conv3x3 24->24 @4K bf16", conv, x24, k)

# window attention block cost at 1/8 (local branch, base)
Ht, Wt = H//8, W//8
x = jnp.asarray(rng.random((2, Ht*Wt, 384)), jnp.bfloat16)
dense_w = jnp.asarray(rng.random((384, 1536)), jnp.bfloat16)
timeit("dense 384->1536 on 2x130k tokens", jax.jit(lambda a, b: a @ b), x, dense_w)
