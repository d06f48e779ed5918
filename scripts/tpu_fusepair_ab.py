"""In-model A/B for the fused conv3x3-pair kernel (conv3x3_pair_hcw_op).

Every stride-1 HCW conv PAIR site (decoder stages, refiner head,
encoder chain) runs as ONE Pallas kernel when the pair tiling fits
VMEM — the [BH, Cmid, W] intermediate stays in a VMEM scratch instead
of making an HBM write + 12-row-slab re-read between two kernels.
Cost: 2 recomputed mid rows per 8-output-row step (~25% stage-A row
recompute). This A/B measures whether the saved HBM round trip beats
the recompute at the real model shapes.

Since the 2026-08-20 default flip (device A/B negative: fused lost
1.1-1.5% in-model), the SEQUENTIAL form is the default and the fused
kernel is opt-in via cfg.hcw_fuse_pairs=True (round-4: migrated from
the ATMVFI_HCW_FUSE env var into the config so the route matrix is
enumerable). Each arm asserts its route was
actually taken by counting Pallas custom calls in the lowered HLO
(every fused pair site collapses two kernels into one), so the A/B and
the --check exactness guard can't silently compare a path against
itself (round-3 ADVICE finding).

Run (exclusive — no concurrent CPU load):
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/tpu_fusepair_ab.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from atmvfi_tpu.models import Network, get_config

print(f"device: {jax.devices()[0]}", flush=True)


def build_cfg(variant, mode):
    """Config for one A/B arm: the fused pair route is the
    cfg.hcw_fuse_pairs field (round-4 migration off the env var)."""
    import dataclasses

    return dataclasses.replace(
        get_config(variant, dtype=jnp.bfloat16),
        hcw_fuse_pairs=(mode == "fused"),
    )


def custom_call_count(net, variables, x0, x1):
    """Number of Pallas custom calls in the lowered serving graph —
    the route-taken witness: fused < sequential, strictly."""
    lowered = jax.jit(lambda v, a, b: net.apply(
        v, a, b, global_motion=True)["I_t"]).lower(variables, x0, x1)
    return lowered.as_text().count("tpu_custom_call")


def frame_time(variant, h, w, iters, mode):
    net = Network(build_cfg(variant, mode))
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
    net_f = Network(build_cfg(variant, "fused"))
    net_s = Network(build_cfg(variant, "sequential"))
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(
        lambda a, b: net_s.init(jax.random.PRNGKey(0), a, b,
                                global_motion=True)
    )(dummy, dummy)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x0 = jax.random.uniform(k1, (1, h, w, 3), jnp.float32)
    x1 = jax.random.uniform(k2, (1, h, w, 3), jnp.float32)

    def run(net):
        f = jax.jit(lambda v, a, b: net.apply(
            v, a, b, global_motion=True)["I_t"])
        return np.asarray(f(variables, x0, x1), np.float32)

    nf = custom_call_count(net_f, variables, x0, x1)
    yf = run(net_f)
    ns = custom_call_count(net_s, variables, x0, x1)
    ys = run(net_s)
    print(f"route witness {variant}: {nf} custom calls fused vs {ns} "
          f"sequential", flush=True)
    assert nf < ns, (
        "fused arm traced the same kernel count as sequential — the "
        "hcw_fuse_pairs config did not take effect; exactness check "
        "would be vacuous"
    )
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
    for variant, h, w, iters in CASES:
        dt = frame_time(variant, h, w, iters, mode)
        results[(mode, variant, h)] = dt
        print(f"{mode:10s} {variant} {h}x{w}: {dt:7.1f} ms/frame "
              f"= {1e3/dt:.2f} fps", flush=True)

print("\nsummary (fused vs sequential):", flush=True)
for variant, h, w, _ in CASES:
    a = results[("fused", variant, h)]
    b = results[("sequential", variant, h)]
    print(f"  {variant} {h}x{w}: {a:.1f} vs {b:.1f} ms "
          f"({100*(b-a)/b:+.1f}% win)", flush=True)
