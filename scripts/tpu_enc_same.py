"""Per-cell factor isolation for the encoder HCW in-model divergence.

Known facts (PERF_NOTES round-2 session 3): the 3->24->24 HCW kernel
pair diverges by ~feature magnitude when run through the flax model
(tpu_enc_drill.py), while the standalone op-sequence probes at the
identical shapes are exact (tpu_enc_probe.py). Two setup differences
separate those cases:
  (A) input x passed as a jit ARGUMENT (drill) vs generated inside the
      jit (probe);
  (B) flax net.apply (drill) vs manual op chain (probe).

Each cell below is ONE self-contained jit computing the kernel route
AND a precision=HIGHEST XLA chain, returning their diff — so eager
artifacts and cross-program compile-context differences are impossible
within a cell. Cells are separate compiles so the kernel chains can't
CSE across flax/manual variants.

  c1 manual chain, x generated in-jit        (expect exact ~3e-6)
  c2 manual chain, x as jit arg              (factor A alone)
  c3 flax apply,   x generated in-jit        (factor B alone)
  c4 flax apply,   x as jit arg              (expect diverging ~0.5)
  c5 = c4 with an optimization_barrier on x  (layout-normalization probe)

The worst cell also prints a (row-band x lane-tile) localization map.
"""
import os
import sys

import jax

if os.environ.get("SMALL") == "1":  # CPU smoke: tiny shapes, cpu backend
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

from atmvfi_tpu.models import Network, get_config
from atmvfi_tpu.ops import conv_pallas as cp

if os.environ.get("SMALL") == "1":
    B, H, W, C0 = 2, 136, 256, 3
else:
    B, H, W, C0 = 2, 1088, 2560, 3


def xla_chain(x, p1, p2):
    def one(x, p):
        k, b, s = p
        y = lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
        ) + b
        return jnp.maximum(y, 0.0) + s * jnp.minimum(y, 0.0)

    return one(one(x, p1), p2)


def manual_chain(x, p1, p2):
    interp = jax.default_backend() != "tpu"  # CPU smoke only
    (k1, b1, s1), (k2, b2, s2) = p1, p2
    xh = cp.nhwc_to_hcw(x)
    xh = cp.conv3x3_hcw_op(xh, k1, b1, s1, H, True, interp)
    xh = cp.conv3x3_hcw_op(xh, k2, b2, s2, H, True, interp)
    return cp.hcw_to_nhwc(xh, B, k2.shape[-1])


def enc_params(v):
    p = v["params"]
    e0 = p["feat_extracts_0"]
    e1 = p["feat_extracts_1"]
    return (
        (e0["conv"]["kernel"], e0["conv"]["bias"], e0["prelu"]),
        (e1["conv"]["kernel"], e1["conv"]["bias"], e1["prelu"]),
    )


def stats(y, ref):
    d = jnp.abs(y - ref)
    # coarse (row-band, lane-half) localization map
    dm = d.max(axis=-1).reshape(B * H // 8, 8, 2, W // 2).max(axis=(1, 3))
    loc = dm.reshape(34, (B * H // 8) // 34, 2).max(axis=1)  # [34, 2]
    return jnp.max(d), jnp.mean(d), loc


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = get_config("base", dtype=jnp.float32)
    if jax.default_backend() != "tpu":  # CPU smoke: interpret-mode route
        import dataclasses

        cfg = dataclasses.replace(cfg, conv_impl="pallas")
    net = Network(cfg)
    var = jax.jit(
        lambda k: net.init(
            k,
            jnp.zeros((1, 64, 128, 3), jnp.float32),
            jnp.zeros((1, 64, 128, 3), jnp.float32),
        )
    )(jax.random.PRNGKey(1))

    def flax_pair(v, x):
        def m(mod, x):
            return mod._conv_pair_hcw(
                mod.feat_extracts[0], mod.feat_extracts[1], x
            )

        return net.apply(v, x, method=m)

    x_arg = jax.jit(
        lambda k: jax.random.uniform(k, (B, H, W, C0), jnp.float32)
    )(jax.random.PRNGKey(3))

    def gen_x(_v):
        return jax.random.uniform(
            jax.random.PRNGKey(7), (B, H, W, C0), jnp.float32
        )

    def c0(v, x):
        """Kernel-free: fused pad+reshape+transpose (nhwc_to_hcw) vs a
        barrier-split equivalent on the SAME arg — catches an XLA-side
        miscompile of the entry layout change without Pallas."""
        y1 = cp.nhwc_to_hcw(x)
        xp = jax.lax.optimization_barrier(
            jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
        )
        y2 = xp.reshape(B * H, W, 8).transpose(0, 2, 1)
        d = jnp.abs(y1 - y2)
        loc = d.max(axis=(1, 2)).reshape(34, -1).max(axis=1)
        return jnp.max(d), jnp.mean(d), jnp.stack([loc, loc], -1)

    def c1(v, x):
        p1, p2 = enc_params(v)
        xi = gen_x(v)
        return stats(manual_chain(xi, p1, p2), xla_chain(xi, p1, p2))

    def c2(v, x):
        p1, p2 = enc_params(v)
        return stats(manual_chain(x, p1, p2), xla_chain(x, p1, p2))

    def c3(v, x):
        p1, p2 = enc_params(v)
        xi = gen_x(v)
        return stats(flax_pair(v, xi), xla_chain(xi, p1, p2))

    def c4(v, x):
        p1, p2 = enc_params(v)
        return stats(flax_pair(v, x), xla_chain(x, p1, p2))

    def c5(v, x):
        p1, p2 = enc_params(v)
        xb = jax.lax.optimization_barrier(x)
        return stats(flax_pair(v, xb), xla_chain(x, p1, p2))

    worst = None
    for tag, fn in [
        ("c0 hcw-entry fused vs split", c0),
        ("c1 manual in-jit ", c1),
        ("c2 manual arg    ", c2),
        ("c3 flax   in-jit ", c3),
        ("c4 flax   arg    ", c4),
        ("c5 flax   arg+bar", c5),
    ]:
        mx, mn, loc = jax.jit(fn)(var, x_arg)
        mx, mn = float(mx), float(mn)
        print(f"{tag}: max={mx:.3e} mean={mn:.3e}", flush=True)
        if worst is None or mx > worst[1]:
            worst = (tag, mx, np.asarray(loc))
    tag, mx, loc = worst
    if mx > 1e-3:
        print(f"localization map for {tag} (34 row bands x 2 lane tiles):")
        print(np.array2string(loc, precision=2), flush=True)


if __name__ == "__main__":
    main()
