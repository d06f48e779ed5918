"""A/B the warp exactness-cond overhead at lite 4K.

Same model/weights, three warp_impl settings:
  tiled            exact (per-call lax.cond fallback)
  tiled_unchecked  identical kernels, no cond (taps clamp to slab)
  xla              gather fallback everywhere

The tiled-vs-unchecked delta isolates what the 8 full/half-res conds
cost (trace r2b: 98 ms 'conditional' bucket) since the kernel work is
identical when flows are in budget.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_cond_ab.py
"""
import dataclasses
import time

import jax
import jax.numpy as jnp

from atmvfi_tpu.models import Network, get_config

print(f"device: {jax.devices()[0]}", flush=True)
base_cfg = get_config("lite", dtype=jnp.bfloat16)

dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
net0 = Network(base_cfg)
variables = jax.jit(
    lambda a, b: net0.init(jax.random.PRNGKey(0), a, b, global_motion=True)
)(dummy, dummy)
jax.block_until_ready(variables)

h, w = 2176, 3840
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
gen = jax.jit(lambda k1, k2: (
    jax.random.uniform(k1, (1, h, w, 3), jnp.float32),
    jnp.roll(jax.random.uniform(k1, (1, h, w, 3), jnp.float32),
             (8, -8), (1, 2)) * 0.7
    + 0.3 * jax.random.uniform(k2, (1, h, w, 3), jnp.float32),
))
x0, x1 = gen(k1, k2)

ITERS = 4
for impl in ("tiled", "tiled_unchecked", "xla"):
    net = Network(dataclasses.replace(base_cfg, warp_impl=impl))

    def chained(v, a, b):
        def body(tok, _):
            y = net.apply(v, a + tok, b, global_motion=True)["I_t"]
            return y[:1, :1, :1, :1] * 0.0, y.mean()
        _, m = jax.lax.scan(body, jnp.zeros((1, 1, 1, 1)), None, length=ITERS)
        return m.sum()

    cf = jax.jit(chained)
    float(cf(variables, x0, x1))
    t0 = time.time()
    float(cf(variables, x0, x1))
    dt = (time.time() - t0) / ITERS
    print(f"{impl:16s}: {dt*1e3:.1f} ms/frame = {1/dt:.2f} fps", flush=True)
