"""Probe: Pallas HCW conv3x3 vs XLA conv at full-res model shapes (v5e).

Three timings per shape:
  xla      — lax.conv NHWC + bias + PReLU (the round-1 model path)
  pl-hcw   — Pallas kernel with activations RESIDENT in HCW across the
             chained iterations (the in-model integration form)
  pl-nhwc  — Pallas kernel paying NHWC<->HCW transposes every call

Inputs are passed as jit ARGUMENTS (a captured closure constant would
be shipped inside the remote-compile request — HTTP 413 on the relay)
and GENERATED ON DEVICE with jax.random (host->device uploads crawl at
~1-2 MB/s through the relay; a 510 MB test tensor would take ~8 min).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_conv_pallas_probe.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from atmvfi_tpu.ops.conv_pallas import (
    conv3x3_hcw,
    conv3x3_nhwc_pallas,
    pack_conv3x3_weights,
)

ITERS = 6


def prelu(y, s):
    return jnp.maximum(y, 0) + s * jnp.minimum(y, 0)


def timed(fn, args, label):
    cf = jax.jit(fn)
    t0 = time.time()
    print(f"  {label}: tracing/compiling...", flush=True)
    float(cf(*args))
    print(f"  {label}: compile {time.time()-t0:.0f}s", end="", flush=True)
    t0 = time.time()
    float(cf(*args))
    dt = (time.time() - t0) / ITERS
    print(f"  {dt*1e3:.2f} ms/conv", flush=True)
    return dt


def main():
    """One (shape, chain) per invocation via argv (the relay connection
    of long-lived processes dies mid-run some days): argv = [H, W, Cin,
    Cout, chain] with chain in {xla, hcw, nhwc}. No args = full sweep."""
    import sys

    print(f"device: {jax.devices()[0]}", flush=True)
    shapes = [
        (2176, 3840, 32, 32),
        (2176, 3840, 64, 64),
        (2176, 3840, 112, 112),   # base decoder 101 padded to the bf16 16-channel granularity
        (1088, 1920, 64, 64),
    ]
    only_chain = None
    if len(sys.argv) >= 5:
        shapes = [tuple(int(a) for a in sys.argv[1:5])]
        only_chain = sys.argv[5] if len(sys.argv) > 5 else None
    for H, W, Cin, Cout in shapes:
        print(f"shape {H}x{W} {Cin}->{Cout} bf16:", flush=True)
        sq = Cin == Cout
        keys = jax.random.split(jax.random.PRNGKey(H + Cin), 4)
        gen = jax.jit(
            lambda ks: (
                jax.random.normal(ks[0], (1, H, W, Cin), jnp.bfloat16),
                jax.random.normal(ks[1], (3, 3, Cin, Cout), jnp.bfloat16)
                * 0.05,
                jax.random.normal(ks[2], (Cout,), jnp.float32) * 0.01,
                jax.random.uniform(ks[3], (Cout,), jnp.float32) * 0.25,
                jax.random.normal(ks[0], (H, Cin, W), jnp.bfloat16),
            )
        )
        print("  gen...", flush=True)
        x, k, b, s, x_hcw = gen(keys)
        print("  gen jit returned; packing weights", flush=True)
        kt = pack_conv3x3_weights(k)
        print("  packed; timing chains", flush=True)

        def chain_xla(x, k, b, s):
            def body(carry, _):
                y = jax.lax.conv_general_dilated(
                    carry, k, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                )
                y = prelu(y + b, s).astype(jnp.bfloat16)
                return (y if sq else carry), jnp.sum(y[:1, :1, :1])
            _, ss = jax.lax.scan(body, x, None, length=ITERS)
            return jnp.sum(ss)

        def chain_hcw(x_hcw, kt, b, s):
            def body(carry, _):
                y = conv3x3_hcw(carry, kt, b, s, H=H)
                return (y if sq else carry), jnp.sum(y[:1, :1, :1])
            _, ss = jax.lax.scan(body, x_hcw, None, length=ITERS)
            return jnp.sum(ss)

        def chain_nhwc(x, k, b, s):
            def body(carry, _):
                y = conv3x3_nhwc_pallas(carry, k, b, s)
                return (y if sq else carry), jnp.sum(y[:1, :1, :1])
            _, ss = jax.lax.scan(body, x, None, length=ITERS)
            return jnp.sum(ss)

        if only_chain == "xla":
            timed(chain_xla, (x, k, b, s), "xla    ")
        elif only_chain == "hcw":
            timed(chain_hcw, (x_hcw, kt, b, s), "pl-hcw ")
        elif only_chain == "nhwc":
            timed(chain_nhwc, (x, k, b, s), "pl-nhwc")
        else:
            t_xla = timed(chain_xla, (x, k, b, s), "xla    ")
            t_hcw = timed(chain_hcw, (x_hcw, kt, b, s), "pl-hcw ")
            t_nhwc = timed(chain_nhwc, (x, k, b, s), "pl-nhwc")
            print(f"  speedup hcw {t_xla/t_hcw:.2f}x  "
                  f"nhwc {t_xla/t_nhwc:.2f}x", flush=True)


if __name__ == "__main__":
    main()
