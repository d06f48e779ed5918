"""Characterize the chained-pallas-kernel corruption (round-2 debug).

Found: conv3x3_hcw_op -> conv3x3_hcw_op back-to-back diverges from the
XLA pair by up to 2e-2 at (768,104,1280) while each call alone is exact
to 4e-6. Questions this probe answers, one TPU run:
  e1  is the chain corruption deterministic (same inputs, two calls)?
  e2  does a forced materializing copy between the calls fix it?
  e3  per-stage: is the first kernel's output already wrong when
      chained (readback forces a consumer), or only the second's?
  e4  does the chain corrupt at W=2560 too (the demo resolution)?
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from atmvfi_tpu.ops import conv_pallas as cp


def build(BH, H, cin_true, W, key, dtype=jnp.float32):
    cinp = cp.channel_pad(cin_true, dtype)
    ks = jax.random.split(key, 7)
    x = jax.random.normal(ks[0], (BH, cinp, W), dtype)
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, cinp, 1), 1)
    x = jnp.where(ch < cin_true, x, 0.0)
    k1 = jax.random.normal(ks[1], (3, 3, cin_true, cin_true),
                           jnp.float32) * 0.1
    b1 = jax.random.normal(ks[2], (cin_true,), jnp.float32) * 0.1
    s1 = jax.random.normal(ks[3], (cin_true,), jnp.float32) * 0.1
    k2 = jax.random.normal(ks[4], (3, 3, cin_true, cin_true),
                           jnp.float32) * 0.1
    b2 = jax.random.normal(ks[5], (cin_true,), jnp.float32) * 0.1
    return x, k1, b1, s1, k2, b2


def stats(y_k, y_x):
    d = jnp.abs(y_k - y_x)
    return jnp.max(d), jnp.mean(d)


def main():
    print("backend:", jax.default_backend(), flush=True)
    BH, H, CT, W = 768, 768, 101, 1280

    def chain(key, copy_between):
        x, k1, b1, s1, k2, b2 = build(BH, H, CT, W, key)
        z = jnp.zeros_like(b2)
        y = cp.conv3x3_hcw_op(x, k1, b1, s1, H, True, False)
        if copy_between:
            # concat-of-slices: XLA materializes a fresh buffer and
            # does not simplify it away
            y = jnp.concatenate([y[:, :8], y[:, 8:]], axis=1)
        y = cp.conv3x3_hcw_op(y, k2, b2, z, H, False, False)
        yx = cp._xla_equiv(x, k1, b1, s1, H, True)
        yx = cp._xla_equiv(yx, k2, b2, z, H, False)
        return y, yx

    cmp2 = jax.jit(lambda a, b: stats(a, b))

    # e1 determinism
    f = jax.jit(lambda k: chain(k, False))
    y1, yx1 = f(jax.random.PRNGKey(3))
    mx, mn = cmp2(y1, yx1)
    print(f"e1a chain run1 vs xla: max={float(mx):.3e} mean={float(mn):.3e}",
          flush=True)
    y2, _ = f(jax.random.PRNGKey(3))
    mx, mn = cmp2(y1, y2)
    print(f"e1b chain run1 vs run2: max={float(mx):.3e}", flush=True)

    # e2 materializing copy between kernels
    g = jax.jit(lambda k: chain(k, True))
    y3, yx3 = g(jax.random.PRNGKey(3))
    mx, mn = cmp2(y3, yx3)
    print(f"e2  chain w/ copy vs xla: max={float(mx):.3e} "
          f"mean={float(mn):.3e}", flush=True)

    # e3 per-stage readback
    def staged(key):
        x, k1, b1, s1, k2, b2 = build(BH, H, CT, W, key)
        z = jnp.zeros_like(b2)
        y_mid = cp.conv3x3_hcw_op(x, k1, b1, s1, H, True, False)
        y = cp.conv3x3_hcw_op(y_mid, k2, b2, z, H, False, False)
        yx_mid = cp._xla_equiv(x, k1, b1, s1, H, True)
        yx = cp._xla_equiv(yx_mid, k2, b2, z, H, False)
        return (*stats(y_mid, yx_mid), *stats(y, yx))
    a, b, c, d = jax.jit(staged)(jax.random.PRNGKey(3))
    print(f"e3  mid: max={float(a):.3e} mean={float(b):.3e}  "
          f"final: max={float(c):.3e} mean={float(d):.3e}", flush=True)

    # e4 chain at the demo full-res width
    BH2, H2, W2 = 1088, 1088, 2560
    def chain2(key):
        x, k1, b1, s1, k2, b2 = build(BH2, H2, CT, W2, key)
        z = jnp.zeros_like(b2)
        y = cp.conv3x3_hcw_op(x, k1, b1, s1, H2, True, False)
        y = cp.conv3x3_hcw_op(y, k2, b2, z, H2, False, False)
        yx = cp._xla_equiv(x, k1, b1, s1, H2, True)
        yx = cp._xla_equiv(yx, k2, b2, z, H2, False)
        return stats(y, yx)
    mx, mn = jax.jit(chain2)(jax.random.PRNGKey(3))
    print(f"e4  chain W=2560: max={float(mx):.3e} mean={float(mn):.3e}",
          flush=True)


if __name__ == "__main__":
    main()
