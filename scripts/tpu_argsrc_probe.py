"""Does weight SOURCING (jit args vs inline-computed) flip the enc-pair
divergence? The flax path (args) diverges on Mosaic; the inline replica
is exact; their jaxprs are structurally identical (jaxpr_enc_diff.py).

  j1 weights computed inline from a key (known exact)
  j2 same weights passed as 6 jit arguments
  j3 j2 plus ~50 dummy extra array arguments (flax passes ~200 params)
  j4 j2 with the XLA side ALSO args (control: both sides same sourcing)
"""
import sys

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from atmvfi_tpu.ops import conv_pallas as cp

B, H, W = 2, 1088, 2560
C0, C1 = 3, 24


def xla_hi(x, k, b, s):
    y = lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    ) + b
    return jnp.maximum(y, 0.0) + s * jnp.minimum(y, 0.0)


def kroute(x, k1, b1, s1, k2, b2, s2):
    xh = cp.nhwc_to_hcw(x)
    xh = cp.conv3x3_hcw_op(xh, k1, b1, s1, H, True, False, W)
    xh = cp.conv3x3_hcw_op(xh, k2, b2, s2, H, True, False, W)
    return cp.hcw_to_nhwc(xh, B, C1, W)


def params(key):
    ks = jax.random.split(key, 6)
    return (jax.random.normal(ks[0], (3, 3, C0, C1), jnp.float32) * 0.2,
            jax.random.normal(ks[1], (C1,), jnp.float32) * 0.1,
            jax.random.normal(ks[2], (C1,), jnp.float32) * 0.2,
            jax.random.normal(ks[3], (3, 3, C1, C1), jnp.float32) * 0.2,
            jax.random.normal(ks[4], (C1,), jnp.float32) * 0.1,
            jax.random.normal(ks[5], (C1,), jnp.float32) * 0.2)


def stats(tag, a, b):
    mx, mn = jax.jit(lambda a, b: (jnp.max(jnp.abs(a - b)),
                                   jnp.mean(jnp.abs(a - b))))(a, b)
    print(f"{tag}: max={float(mx):.3e} mean={float(mn):.3e}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    kw, kx = jax.random.split(jax.random.PRNGKey(5))
    x = jax.jit(lambda k: jax.random.uniform(
        k, (B, H, W, C0), jnp.float32))(kx)
    w = jax.jit(params)(kw)

    def j1(key, x):
        p = params(key)
        return kroute(x, *p), xla_hi(xla_hi(x, *p[:3]), *p[3:])
    a, b = jax.jit(j1)(kw, x)
    stats("j1 inline weights   ", a, b)

    def j2(x, k1, b1, s1, k2, b2, s2):
        return (kroute(x, k1, b1, s1, k2, b2, s2),)
    (a2,) = jax.jit(j2)(x, *w)
    stats("j2 arg weights      ", a2, b)
    stats("j2 vs j1 kernel-side", a2, a)

    def j3(x, ws, dummies):
        return (kroute(x, *ws),)
    dummies = jax.jit(lambda k: [
        jax.random.normal(kk, (128, 128), jnp.float32)
        for kk in jax.random.split(k, 50)])(jax.random.PRNGKey(9))
    (a3,) = jax.jit(j3)(x, w, dummies)
    stats("j3 +50 dummy args   ", a3, b)

    def j4(x, k1, b1, s1, k2, b2, s2):
        return (kroute(x, k1, b1, s1, k2, b2, s2),
                xla_hi(xla_hi(x, k1, b1, s1), k2, b2, s2))
    a4, b4 = jax.jit(j4)(x, *w)
    stats("j4 both-sides args  ", a4, b4)


if __name__ == "__main__":
    main()
