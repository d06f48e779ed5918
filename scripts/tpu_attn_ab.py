"""Model-level A/B of the packed layout-native fused attention kernel.

VERDICT round-1 item 8: the fused kernel is 1.6x faster standalone but
round-1 lost ~6% at model level to q/kv layout transitions; the packed
form since removed all transposes (projections feed [BW, N, C] /
[BW, N, 2C] straight through BlockSpec head slicing). Re-measure
attention_impl = xla vs pallas at model level, scan-chained (device-
true, no per-frame relay fences), lite + base at 1080p and 4K.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_attn_ab.py
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

from atmvfi_tpu.models import Network, get_config

print(f"device: {jax.devices()[0]}", flush=True)

QUICK = "--quick" in sys.argv  # headline pair only: lite 4K + base 1080p

dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
k1, k2 = jax.random.split(jax.random.PRNGKey(0))

for variant in ("lite", "base"):
    base_cfg = get_config(variant, dtype=jnp.bfloat16)
    net0 = Network(base_cfg)
    variables = jax.jit(
        lambda a, b: net0.init(jax.random.PRNGKey(0), a, b,
                               global_motion=True)
    )(dummy, dummy)
    jax.block_until_ready(variables)

    res_list = ((1088, 1920), (2176, 3840))
    if QUICK:
        res_list = ((2176, 3840),) if variant == "lite" else ((1088, 1920),)
    for h, w in res_list:
        gen = jax.jit(lambda k1, k2: (
            jax.random.uniform(k1, (1, h, w, 3), jnp.float32),
            jnp.roll(jax.random.uniform(k1, (1, h, w, 3), jnp.float32),
                     (8, -8), (1, 2)) * 0.7
            + 0.3 * jax.random.uniform(k2, (1, h, w, 3), jnp.float32),
        ))
        x0, x1 = gen(k1, k2)
        ITERS = 6 if h <= 1100 else 4
        for impl in ("xla", "pallas"):
            net = Network(
                dataclasses.replace(base_cfg, attention_impl=impl)
            )

            def chained(v, a, b):
                def body(tok, _):
                    y = net.apply(v, a + tok, b, global_motion=True)["I_t"]
                    return y[:1, :1, :1, :1] * 0.0, y.mean()

                _, m = jax.lax.scan(
                    body, jnp.zeros((1, 1, 1, 1)), None, length=ITERS
                )
                return m.sum()

            cf = jax.jit(chained)
            float(cf(variables, x0, x1))
            t0 = time.time()
            float(cf(variables, x0, x1))
            dt = (time.time() - t0) / ITERS
            print(
                f"{variant} {h}x{w} attn={impl:6s}: {dt*1e3:.1f} ms/frame"
                f" = {1/dt:.2f} fps", flush=True,
            )
