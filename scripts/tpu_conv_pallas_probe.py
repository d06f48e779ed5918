"""Probe: Pallas HCW conv3x3 vs XLA conv at full-res model shapes (v5e).

Three timings per shape:
  xla      — lax.conv NHWC + bias + PReLU (the round-1 model path)
  pl-hcw   — Pallas kernel with activations RESIDENT in HCW across the
             chained iterations (the in-model integration form)
  pl-nhwc  — Pallas kernel paying NHWC<->HCW transposes every call

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


def timed(make_chain, label):
    cf = jax.jit(make_chain)
    t0 = time.time()
    float(cf())
    print(f"  {label}: compile {time.time()-t0:.0f}s", end="", flush=True)
    t0 = time.time()
    float(cf())
    dt = (time.time() - t0) / ITERS
    print(f"  {dt*1e3:.2f} ms/conv", flush=True)
    return dt


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    shapes = [
        (2176, 3840, 32, 32),
        (2176, 3840, 40, 40),     # lite decoder 37 padded to 40
        (2176, 3840, 64, 64),
        (2176, 3840, 104, 104),   # base decoder 101 padded
        (1088, 1920, 64, 64),
    ]
    for H, W, Cin, Cout in shapes:
        print(f"shape {H}x{W} {Cin}->{Cout} bf16:", flush=True)
        sq = Cin == Cout
        x = jnp.asarray(rng.standard_normal((1, H, W, Cin)), jnp.bfloat16)
        k = jnp.asarray(
            rng.standard_normal((3, 3, Cin, Cout)) * 0.05, jnp.bfloat16
        )
        b = jnp.asarray(rng.standard_normal((Cout,)) * 0.01, jnp.float32)
        s = jnp.asarray(rng.random((Cout,)) * 0.25, jnp.float32)
        kt = pack_conv3x3_weights(k)
        x_hcw = jnp.asarray(
            rng.standard_normal((H, Cin, W)), jnp.bfloat16
        )

        def chain_xla():
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

        def chain_hcw():
            def body(carry, _):
                y = conv3x3_hcw(carry, kt, b, s, H=H)
                return (y if sq else carry), jnp.sum(y[:1, :1, :1])
            _, ss = jax.lax.scan(body, x_hcw, None, length=ITERS)
            return jnp.sum(ss)

        def chain_nhwc():
            def body(carry, _):
                y = conv3x3_nhwc_pallas(carry, k, b, s)
                return (y if sq else carry), jnp.sum(y[:1, :1, :1])
            _, ss = jax.lax.scan(body, x, None, length=ITERS)
            return jnp.sum(ss)

        t_xla = timed(chain_xla, "xla    ")
        t_hcw = timed(chain_hcw, "pl-hcw ")
        t_nhwc = timed(chain_nhwc, "pl-nhwc")
        print(f"  speedup hcw {t_xla/t_hcw:.2f}x  nhwc {t_xla/t_nhwc:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
