"""Benchmark: 2x-interpolation throughput on one TPU chip.

Measures steady-state frames/sec of the base model (global motion on,
bf16 compute) at 4K (3840x2160 padded to /64 per the demo protocol,
demo_2x.py:74) — the BASELINE.json north-star is >=30 fps/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra context lines go to stderr.
"""
import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_resolution(pipeline, h, w, iters=8, warmup=2):
    import jax
    import jax.numpy as jnp

    from atmvfi_tpu.infer.padder import InputPadder

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((1, h, w, 3), np.float32))
    x1 = jnp.asarray(rng.random((1, h, w, 3), np.float32))
    padder = InputPadder(x0.shape, divisor=64)
    x0, x1 = padder.pad(x0, x1)
    t0 = time.time()
    out = pipeline.interpolate_device(x0, x1)
    out.block_until_ready()
    log(f"  first call (compile+run) at {h}x{w}: {time.time()-t0:.1f}s")
    for _ in range(warmup):
        pipeline.interpolate_device(x0, x1).block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        out = pipeline.interpolate_device(x0, x1)
    out.block_until_ready()
    dt = (time.time() - t0) / iters
    return 1.0 / dt


def main():
    import jax
    import jax.numpy as jnp

    from atmvfi_tpu.infer.pipeline import InterpolationPipeline
    from atmvfi_tpu.models import Network, get_config

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    cfg = get_config("base", dtype=jnp.bfloat16)
    net = Network(cfg)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = net.init(rng, dummy, dummy, global_motion=True)
    pipeline = InterpolationPipeline(
        variables, variant="base", dtype=jnp.bfloat16, global_motion=True
    )

    fps_1080 = bench_resolution(pipeline, 1080, 1920)
    log(f"1080p 2x interp: {fps_1080:.2f} fps/chip")

    fps_4k = bench_resolution(pipeline, 2160, 3840, iters=5)
    log(f"4K 2x interp: {fps_4k:.2f} fps/chip")

    result = {
        "metric": "fps_4k_2x_base_bf16",
        "value": round(fps_4k, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps_4k / 30.0, 3),
        "extra": {"fps_1080p": round(fps_1080, 3)},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
