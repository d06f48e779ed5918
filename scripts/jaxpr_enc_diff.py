"""Offline (CPU) jaxpr diff: flax-wrapped enc HCW pair vs manual replica.

The two compute the same math but only the flax one diverges on real
Mosaic. Their jaxprs must differ somewhere — find it without hardware.
"""
import sys
from unittest import mock

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

from atmvfi_tpu.models import Network, get_config  # noqa: E402
from atmvfi_tpu.ops import conv_pallas as cp  # noqa: E402

B, H, W = 2, 1088, 2560
C0, C1 = 3, 24


def main():
    cfg = get_config("base", dtype=jnp.float32)
    net = Network(cfg)
    variables = jax.eval_shape(
        lambda k: net.init(k, jnp.zeros((1, 64, 128, 3), jnp.float32),
                           jnp.zeros((1, 64, 128, 3), jnp.float32)),
        jax.random.PRNGKey(1),
    )
    x = jax.ShapeDtypeStruct((B, H, W, C0), jnp.float32)

    def m(mod, x):
        return mod._conv_pair_hcw(mod.feat_extracts[0],
                                  mod.feat_extracts[1], x)

    def flax_fn(v, x):
        return net.apply(v, x, method=m)

    k_sh = jax.ShapeDtypeStruct((3, 3, C0, C1), jnp.float32)
    k2_sh = jax.ShapeDtypeStruct((3, 3, C1, C1), jnp.float32)
    v_sh = jax.ShapeDtypeStruct((C1,), jnp.float32)

    def manual_fn(k1, b1, s1, k2, b2, s2, x):
        xh = cp.nhwc_to_hcw(x)
        xh = cp.conv3x3_hcw_op(xh, k1, b1, s1, H, True, False, W)
        xh = cp.conv3x3_hcw_op(xh, k2, b2, s2, H, True, False, W)
        return cp.hcw_to_nhwc(xh, B, C1, W)

    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        jpr_flax = jax.make_jaxpr(flax_fn)(variables, x)
        jpr_man = jax.make_jaxpr(manual_fn)(
            k_sh, v_sh, v_sh, k2_sh, v_sh, v_sh, x)
    with open("/tmp/jaxpr_flax.txt", "w") as f:
        f.write(str(jpr_flax))
    with open("/tmp/jaxpr_manual.txt", "w") as f:
        f.write(str(jpr_man))
    print("flax eqn count:", len(jpr_flax.jaxpr.eqns))
    print("manual eqn count:", len(jpr_man.jaxpr.eqns))
    for tag, jpr in (("flax", jpr_flax), ("manual", jpr_man)):
        ops = [e.primitive.name for e in jpr.jaxpr.eqns]
        print(tag, "op sequence:", ops)


if __name__ == "__main__":
    main()
