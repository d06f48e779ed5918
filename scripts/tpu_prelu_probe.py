"""Single-kernel probe of the prelu=False conv3x3_hcw path on Mosaic.

Every previously-exact single-kernel probe used prelu=True; the broken
second kernel in the chain probes is prelu=False. Isolates that flag.
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from atmvfi_tpu.ops import conv_pallas as cp


def case(name, BH, H, cin_true, cout, W, prelu):
    dtype = jnp.float32
    cinp = cp.channel_pad(cin_true, dtype)

    def f(key):
        ks = jax.random.split(key, 4)
        x = jax.random.normal(ks[0], (BH, cinp, W), dtype)
        ch = jax.lax.broadcasted_iota(jnp.int32, (1, cinp, 1), 1)
        x = jnp.where(ch < cin_true, x, 0.0)
        k = jax.random.normal(ks[1], (3, 3, cin_true, cout),
                              jnp.float32) * 0.1
        b = jax.random.normal(ks[2], (cout,), jnp.float32) * 0.1
        s = jax.random.normal(ks[3], (cout,), jnp.float32) * 0.1
        z = jnp.zeros_like(b)
        y_k = cp.conv3x3_hcw_op(x, k, b, s if prelu else z, H, prelu,
                                False)
        y_x = cp._xla_equiv(x, k, b, s if prelu else z, H, prelu)
        d = jnp.abs(y_k - y_x)
        return jnp.max(d), jnp.mean(d), jnp.max(jnp.abs(y_x))

    mx, mn, ref = jax.jit(f)(jax.random.PRNGKey(11))
    print(f"{name}: max|d|={float(mx):.3e} mean={float(mn):.3e} "
          f"ref_max={float(ref):.3e}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    case("f1 101ch W1280 prelu=False", 768, 768, 101, 101, 1280, False)
    case("f2 101ch W1280 prelu=True ", 768, 768, 101, 101, 1280, True)
    case("f3 101ch W2560 prelu=False", 1088, 1088, 101, 101, 2560, False)
    case("f4  64ch W1280 prelu=False", 768, 768, 64, 64, 1280, False)
