"""Device A/B: round-5 fused transformer-BLOCK kernel vs the round-4
packed attention kernel, in-model at the headline configs.

Run (exclusive): PYTHONPATH=/root/repo:/root/.axon_site \
    python -u scripts/tpu_block_attn_ab.py
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

from atmvfi_tpu.models import Network, get_config

print("device:", jax.devices()[0], flush=True)


def frames(h, w, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return jax.jit(lambda k1, k2: (
        jax.random.uniform(k1, (1, h, w, 3), jnp.float32),
        jnp.roll(jax.random.uniform(k1, (1, h, w, 3), jnp.float32),
                 (8, -8), (1, 2)) * 0.7
        + 0.3 * jax.random.uniform(k2, (1, h, w, 3), jnp.float32),
    ))(k1, k2)


def timed(net, v, a, b, iters=4):
    def chained(v, a, b):
        def body(tok, _):
            y = net.apply(v, a + tok, b, global_motion=True)["I_t"]
            return (y[:1, :1, :1, :1] * 0.0).astype(jnp.float32), y.mean()
        _, m = jax.lax.scan(body, jnp.zeros((1, 1, 1, 1)), None, length=iters)
        return m.sum()
    cf = jax.jit(chained)
    float(cf(v, a, b))
    t0 = time.time()
    float(cf(v, a, b))
    return (time.time() - t0) / iters


for variant, (H, W) in (("lite", (2176, 3840)), ("base", (1088, 1920))):
    cfg0 = get_config(variant, dtype=jnp.bfloat16)
    net0 = Network(cfg0)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = jax.jit(lambda a, b: net0.init(jax.random.PRNGKey(0), a, b,
                                       global_motion=True))(dummy, dummy)
    jax.block_until_ready(v)
    a, b = frames(H, W)
    res = {}
    for impl in ("pallas", "pallas_block"):
        net = Network(dataclasses.replace(cfg0, attention_impl=impl))
        t = timed(net, v, a, b)
        res[impl] = t
        print(f"{variant} {H}x{W} {impl}: {t*1e3:.1f} ms/frame "
              f"({1/t:.2f} fps)", flush=True)
    d = (res["pallas"] - res["pallas_block"]) / res["pallas"] * 100
    print(f"{variant}: block vs packed {d:+.1f}%", flush=True)
