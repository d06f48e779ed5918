"""In-model A/B for the stacked-dx weight matmuls (conv + deconv).

stack_dx_profitable()/_stack_heads() collapse the three per-dx (four
per-parity) weight matmuls into ONE taller matmul when Cout_pad is
narrow — the 128x128 MXU streams all N columns once per 128 weight
rows, so three M=32 matmuls pay 3 full N-streams for a quarter of the
array (ops/conv_pallas.py::stack_dx_profitable). Qualifying sites are
the full-res refiner/encoder convs (Cout_pad 32/64) and every deconv
head (Cout_pad <= 96); the 240ch decoder pairs don't qualify.

The ATMVFI_NO_STACKDX kill switch is read at TRACE time, so one
process can A/B by toggling the env var between fresh jits.

Run (exclusive — no concurrent CPU load):
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/tpu_stackdx_ab.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from atmvfi_tpu.models import Network, get_config

print(f"device: {jax.devices()[0]}", flush=True)


def frame_time(variant, h, w, iters):
    cfg = get_config(variant, dtype=jnp.bfloat16)
    net = Network(cfg)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(
        lambda a, b: net.init(jax.random.PRNGKey(0), a, b,
                              global_motion=True)
    )(dummy, dummy)
    jax.block_until_ready(variables)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    gen = jax.jit(lambda k1, k2: (
        jax.random.uniform(k1, (1, h, w, 3), jnp.float32),
        jnp.roll(jax.random.uniform(k1, (1, h, w, 3), jnp.float32),
                 (8, -8), (1, 2)) * 0.7
        + 0.3 * jax.random.uniform(k2, (1, h, w, 3), jnp.float32),
    ))
    x0, x1 = gen(k1, k2)

    def chained(v, a, b):
        def body(tok, _):
            y = net.apply(v, a + tok, b, global_motion=True)["I_t"]
            return y[:1, :1, :1, :1] * 0.0, y.mean()

        _, m = jax.lax.scan(body, jnp.zeros((1, 1, 1, 1)), None,
                            length=iters)
        return m.sum()

    cf = jax.jit(chained)
    float(cf(variables, x0, x1))
    t0 = time.time()
    float(cf(variables, x0, x1))
    return (time.time() - t0) / iters * 1e3


CASES = [("lite", 2176, 3840, 4), ("base", 1088, 1920, 8),
         ("base", 2176, 3840, 4)]
results = {}
for mode in ("stacked", "unstacked"):
    if mode == "unstacked":
        os.environ["ATMVFI_NO_STACKDX"] = "1"
    else:
        os.environ.pop("ATMVFI_NO_STACKDX", None)
    for variant, h, w, iters in CASES:
        dt = frame_time(variant, h, w, iters)
        results[(mode, variant, h)] = dt
        print(f"{mode:9s} {variant} {h}x{w}: {dt:7.1f} ms/frame "
              f"= {1e3/dt:.2f} fps", flush=True)

print("\nsummary (stacked vs unstacked):", flush=True)
for variant, h, w, _ in CASES:
    a = results[("stacked", variant, h)]
    b = results[("unstacked", variant, h)]
    print(f"  {variant} {h}x{w}: {a:.1f} vs {b:.1f} ms "
          f"({100*(b-a)/b:+.1f}% win)", flush=True)
