"""Probe: full-res conv formulations vs XLA conv on the v5e.

Round-1 traces showed ~150-200 ms/frame of XLA conv-boundary layout
copies at 4K plus a PReLU pass XLA refuses to epilogue-fuse into convs
(PERF_NOTES.md). This probe measures, at the exact full-resolution
model shapes, whether re-expressing conv3x3(+bias+PReLU) as
im2col-shift + dot_general (MXU matmul with a fused epilogue) beats
lax.conv_general_dilated end to end (same NHWC in/out layout).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_conv_probe.py
"""
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

ITERS = 6


def prelu(x, slope):
    # max(x,0) + slope*min(x,0) as arithmetic (round-1 winner)
    return jnp.maximum(x, 0) + slope * jnp.minimum(x, 0)


def conv_xla(x, k, b, slope):
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return prelu(y + b, slope).astype(x.dtype)


def conv_im2col(x, k, b, slope):
    """9 shifted views concatenated channelwise, then one matmul."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [
        xp[:, dy : dy + H, dx : dx + W, :]
        for dy in range(3)
        for dx in range(3)
    ]
    patches = jnp.concatenate(cols, axis=-1)  # [B, H, W, 9C]
    kmat = k.reshape(9 * C, -1)  # HWIO -> [9C, Cout]
    y = jax.lax.dot_general(
        patches, kmat,
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return prelu(y + b, slope).astype(x.dtype)


def timed(fn, x, k, b, slope, label):
    def chained(x, k, b, slope):
        def body(tok, _):
            y = fn(x + tok, k, b, slope)
            # zero-valued scalar token keeps the iterations serialized
            return jnp.sum(y[:1, :1, :1, :1]).astype(x.dtype) * 0, jnp.sum(
                y[:1, :1, :1]
            )
        _, s = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=ITERS)
        return jnp.sum(s)

    cf = jax.jit(chained)
    float(cf(x, k, b, slope))  # compile
    t0 = time.time()
    float(cf(x, k, b, slope))
    dt = (time.time() - t0) / ITERS
    print(f"  {label}: {dt*1e3:.2f} ms/conv", flush=True)
    return dt


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    shapes = [
        # (H, W, Cin, Cout) - full-res decoder/refiner shapes, bf16
        (2176, 3840, 32, 32),    # lite refiner hidden
        (2176, 3840, 37, 37),    # lite decoder stage 0 (32+5)
        (2176, 3840, 64, 64),    # base refiner hidden
        (2176, 3840, 101, 101),  # base decoder stage 0 (96+5)
        (2176, 3840, 116, 64),   # base refiner proj
        (1088, 1920, 64, 64),    # 1080p base refiner
    ]
    rng = np.random.default_rng(0)
    for H, W, Cin, Cout in shapes:
        print(f"shape {H}x{W} {Cin}->{Cout} bf16:", flush=True)
        x = jnp.asarray(rng.standard_normal((1, H, W, Cin)), jnp.bfloat16)
        k = jnp.asarray(
            rng.standard_normal((3, 3, Cin, Cout)) * 0.05, jnp.bfloat16
        )
        b = jnp.asarray(rng.standard_normal((Cout,)) * 0.01, jnp.float32)
        slope = jnp.asarray(rng.random((Cout,)) * 0.25, jnp.float32)
        t_xla = timed(conv_xla, x, k, b, slope, "xla conv ")
        t_im2 = timed(conv_im2col, x, k, b, slope, "im2col   ")
        print(f"  ratio xla/im2col: {t_xla/t_im2:.2f}x", flush=True)


if __name__ == "__main__":
    main()
