"""A/B: fused dual-warp+blend kernel vs separate warps, model level.

Measures the serving fps (jit of apply(...)["I_t"]) for base+lite at
1080p and 4K with the round-2 fused blend path (current code) and with
warp_impl unchanged but blends composed (round-1 behavior, recovered by
monkeypatching flow_warp_blend to always compose).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_blend_ab.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from atmvfi_tpu.models import Network, get_config
from atmvfi_tpu.ops import warp_pallas


def build(variant):
    cfg = get_config(variant, dtype=jnp.bfloat16)
    net = Network(cfg)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(
        lambda a, b: net.init(jax.random.PRNGKey(0), a, b, global_motion=True)
    )(dummy, dummy)
    jax.block_until_ready(variables)
    return variables, net


def frame_pairs(rng, iters, h, w):
    x0 = rng.random((iters, 1, h, w, 3), np.float32)
    x1 = np.roll(x0, shift=(8, -8), axis=(2, 3))
    x1 = 0.7 * x1 + 0.3 * rng.random((iters, 1, h, w, 3), np.float32)
    return jnp.stack([jnp.asarray(x0), jnp.asarray(x1)], axis=1)


def bench(variables, net, h, w, iters, label):
    rng = np.random.default_rng(0)
    stacked = frame_pairs(rng, iters, h, w)

    def chained(variables, stacked):
        def body(tok, pair):
            y = net.apply(variables, pair[0] + tok, pair[1],
                          global_motion=True)["I_t"]
            return y[:, :1, :1, :1] * 0.0, y.mean()

        _, means = jax.lax.scan(body, jnp.zeros((1, 1, 1, 1)), stacked)
        return means.sum()

    cf = jax.jit(chained)
    t0 = time.time()
    float(cf(variables, stacked))
    print(f"  [{label}] compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    float(cf(variables, stacked))
    dt = (time.time() - t0) / iters
    print(f"  [{label}] {h}x{w}: {dt*1e3:.1f} ms/frame = {1/dt:.2f} fps",
          flush=True)
    return dt


_orig_tiled_blend = warp_pallas._tiled_blend


def use_composed(on: bool):
    """Force the round-1 behavior: blends composed from two warps."""
    if on:
        warp_pallas._tiled_blend = (
            lambda im0, im1, f0, f1, occ, interp:
            occ * warp_pallas.flow_warp_dispatch(im0, f0, "tiled")
            + (1 - occ) * warp_pallas.flow_warp_dispatch(im1, f1, "tiled")
        )
    else:
        warp_pallas._tiled_blend = _orig_tiled_blend


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    for variant in ("lite", "base"):
        variables, net = build(variant)
        for (h, w, iters) in ((1088, 1920, 8), (2176, 3840, 4)):
            print(f"{variant} {h}x{w}:", flush=True)
            use_composed(True)
            t_sep = bench(variables, net, h, w, iters, "separate")
            use_composed(False)
            t_fused = bench(variables, net, h, w, iters, "fused  ")
            print(f"  fused speedup: {t_sep/t_fused:.3f}x", flush=True)


if __name__ == "__main__":
    main()
