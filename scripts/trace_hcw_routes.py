"""Enumerate HCW Pallas route activations at a given resolution.

Abstract-traces the full model via jax.eval_shape on CPU with
jax.default_backend() faked to 'tpu', logging every
conv3x3_hcw_op / deconv2x_hcw_op call (shapes, H, w_true). No compute.
Usage: python scripts/trace_hcw_routes.py [base|lite] [H] [W]
"""
import sys
from unittest import mock

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

from atmvfi_tpu.models import Network, get_config  # noqa: E402
from atmvfi_tpu.ops import conv_pallas as cp  # noqa: E402
from atmvfi_tpu.ops import deconv_pallas as dp  # noqa: E402

_conv = cp.conv3x3_hcw_op
_deconv = dp.deconv2x_hcw_op


def conv_log(x, k, b, s, H, prelu, interpret, w_true=None):
    print(f"CONV  x={tuple(x.shape)} k={tuple(k.shape)} H={H} "
          f"prelu={prelu} wt={w_true}", flush=True)
    return _conv(x, k, b, s, H, prelu, False, w_true)


def deconv_log(x, k, b, s, prelu, interpret, w_true=None):
    print(f"DECONV x={tuple(x.shape)} k={tuple(k.shape)} "
          f"prelu={prelu} wt={w_true}", flush=True)
    return _deconv(x, k, b, s, prelu, False, w_true)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "base"
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1088
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 2560
    cfg = get_config(name)
    net = Network(cfg)
    im = jax.ShapeDtypeStruct((1, H, W, 3), jnp.float32)
    variables = jax.eval_shape(
        net.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 128, 3), jnp.float32),
        jnp.zeros((1, 64, 128, 3), jnp.float32),
    )
    with mock.patch.object(jax, "default_backend", return_value="tpu"), \
         mock.patch.object(cp, "conv3x3_hcw_op", conv_log), \
         mock.patch.object(dp, "deconv2x_hcw_op", deconv_log):
        out = jax.eval_shape(
            lambda v, a, b: net.apply(v, a, b, global_motion=True),
            variables, im, im,
        )
    print("I_t:", out["I_t"].shape)


if __name__ == "__main__":
    main()
