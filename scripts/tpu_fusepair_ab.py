"""In-model A/B for the fused conv3x3-pair kernel (conv3x3_pair_hcw_op).

Every stride-1 HCW conv PAIR site (decoder stages, refiner head,
encoder chain) runs as ONE Pallas kernel when the pair tiling fits
VMEM — the [BH, Cmid, W] intermediate stays in a VMEM scratch instead
of making an HBM write + 12-row-slab re-read between two kernels.
Cost: 2 recomputed mid rows per 8-output-row step (~25% stage-A row
recompute). This A/B measures whether the saved HBM round trip beats
the recompute at the real model shapes.

ATMVFI_HCW_DISABLE=fuse (read at TRACE time) forces the sequential
two-kernel form, so one process A/Bs by toggling between fresh jits.

Run (exclusive — no concurrent CPU load):
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/tpu_fusepair_ab.py
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


def exactness_check(variant, h, w):
    """Fused vs sequential outputs at real weights/shapes ON DEVICE —
    guards the Mosaic compile path, which interpret-mode CI can't."""
    cfg = get_config(variant, dtype=jnp.bfloat16)
    net = Network(cfg)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(
        lambda a, b: net.init(jax.random.PRNGKey(0), a, b,
                              global_motion=True)
    )(dummy, dummy)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x0 = jax.random.uniform(k1, (1, h, w, 3), jnp.float32)
    x1 = jax.random.uniform(k2, (1, h, w, 3), jnp.float32)

    def run():
        f = jax.jit(lambda v, a, b: net.apply(
            v, a, b, global_motion=True)["I_t"])
        return np.asarray(f(variables, x0, x1), np.float32)

    os.environ.pop("ATMVFI_HCW_DISABLE", None)
    yf = run()
    os.environ["ATMVFI_HCW_DISABLE"] = "fuse"
    ys = run()
    os.environ.pop("ATMVFI_HCW_DISABLE", None)
    d = np.abs(yf - ys).max()
    print(f"exactness {variant} {h}x{w}: max|fused-seq| = {d:.3e}",
          flush=True)
    assert d < 1e-2, "fused pair diverges on device — do not enable"


import numpy as np  # noqa: E402

if "--check" in sys.argv or "--check-only" in sys.argv:
    exactness_check("lite", 1088, 1920)
    exactness_check("base", 544, 960)
    if "--check-only" in sys.argv:
        sys.exit(0)

if "--quick" in sys.argv:
    # session-budget variant: the two headline configs only
    CASES = [("lite", 2176, 3840, 4), ("base", 1088, 1920, 8)]
else:
    CASES = [("lite", 2176, 3840, 4), ("lite", 1088, 1920, 8),
             ("base", 1088, 1920, 8), ("base", 2176, 3840, 4)]
results = {}
for mode in ("fused", "sequential"):
    if mode == "sequential":
        os.environ["ATMVFI_HCW_DISABLE"] = "fuse"
    else:
        os.environ.pop("ATMVFI_HCW_DISABLE", None)
    for variant, h, w, iters in CASES:
        dt = frame_time(variant, h, w, iters)
        results[(mode, variant, h)] = dt
        print(f"{mode:10s} {variant} {h}x{w}: {dt:7.1f} ms/frame "
              f"= {1e3/dt:.2f} fps", flush=True)

print("\nsummary (fused vs sequential):", flush=True)
for variant, h, w, _ in CASES:
    a = results[("fused", variant, h)]
    b = results[("sequential", variant, h)]
    print(f"  {variant} {h}x{w}: {a:.1f} vs {b:.1f} ms "
          f"({100*(b-a)/b:+.1f}% win)", flush=True)
