"""On-device check of the HCW deconv+conv decoder route at 4K.

Compares conv_impl="pallas"-routed lite forward (HCW deconv kernel
active at the full-res stage) against conv_impl="xla" under one jit
(relay-safe comparison) and times both with a small scan chain.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_deconv_check.py
"""
import dataclasses
import time

import jax
import jax.numpy as jnp

from atmvfi_tpu.models import Network, get_config

print(f"device: {jax.devices()[0]}", flush=True)
cfg_p = get_config("lite", dtype=jnp.bfloat16)
cfg_x = dataclasses.replace(cfg_p, conv_impl="xla")
net_p, net_x = Network(cfg_p), Network(cfg_x)

dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
variables = jax.jit(
    lambda a, b: net_p.init(jax.random.PRNGKey(0), a, b, global_motion=True)
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


@jax.jit
def psnr_pair(v, a, b):
    yp = jnp.clip(net_p.apply(v, a, b, global_motion=True)["I_t"], 0, 1)
    yx = jnp.clip(net_x.apply(v, a, b, global_motion=True)["I_t"], 0, 1)
    mse = jnp.mean((yp - yx) ** 2)
    return -10.0 * jnp.log10(mse + 1e-12)


print(f"pallas-vs-xla routes: {float(psnr_pair(variables, x0, x1)):.2f} dB",
      flush=True)

ITERS = 4
for tag, net in (("pallas", net_p), ("xla   ", net_x)):
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
    print(f"{tag}: {dt*1e3:.1f} ms/frame = {1/dt:.2f} fps", flush=True)
