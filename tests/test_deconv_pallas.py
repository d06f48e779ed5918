"""Pallas HCW deconv2x kernel vs XLA conv_transpose (interpret, CPU)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atmvfi_tpu.ops.conv_pallas import hcw_to_nhwc, nhwc_to_hcw
from atmvfi_tpu.ops.deconv_pallas import deconv2x_hcw_op


def _ref_deconv(x, k, b, slope):
    y = jax.lax.conv_transpose(
        x, k[::-1, ::-1], strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    if slope is not None:
        y = jnp.maximum(y, 0) + slope * jnp.minimum(y, 0)
    return y


@pytest.mark.parametrize(
    "name,B,H,W,Cin,Cout,prelu",
    [
        ("plain", 1, 16, 128, 8, 8, True),
        ("noact", 1, 16, 128, 8, 16, False),
        ("batch", 2, 16, 128, 8, 8, True),
        ("oddch", 1, 16, 128, 13, 11, True),   # channel padding path
        ("wide", 1, 8, 256, 8, 8, True),
    ],
)
def test_deconv2x_matches_xla(name, B, H, W, Cin, Cout, prelu):
    rng = np.random.default_rng(hash(name) % 997)
    x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 2, Cin, Cout)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.random((Cout,)) * 0.5, jnp.float32) if prelu else None
    xh = nhwc_to_hcw(x)
    yh = deconv2x_hcw_op(
        xh, k, b, s if s is not None else jnp.zeros_like(b),
        prelu, True,
    )
    got = hcw_to_nhwc(yh, B, Cout)
    want = _ref_deconv(x, k, b, s)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4
    )


def test_deconv2x_gradients_match_xla():
    rng = np.random.default_rng(41)
    B, H, W, Cin, Cout = 1, 16, 128, 8, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 2, Cin, Cout)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.random((Cout,)) * 0.5, jnp.float32)

    def loss_pl(x, k, b, s):
        y = deconv2x_hcw_op(nhwc_to_hcw(x), k, b, s, True, True)
        return jnp.sum(y ** 2)

    def loss_ref(x, k, b, s):
        return jnp.sum(_ref_deconv(x, k, b, s) ** 2)

    gp = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(x, k, b, s)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, k, b, s)
    for a, w in zip(gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), atol=5e-3, rtol=1e-3
        )


def test_model_deconv_hcw_path_matches_xla():
    """64x256 lite: the full-res decoder stage takes the HCW deconv
    route (input w=128 qualifies); outputs must match the XLA path."""
    from atmvfi_tpu.models import Network, get_config

    cfg_x = get_config("lite")
    cfg_p = dataclasses.replace(get_config("lite"), conv_impl="pallas")
    rng = np.random.default_rng(9)
    im0 = jnp.asarray(rng.random((1, 64, 256, 3)), jnp.float32)
    im1 = jnp.asarray(rng.random((1, 64, 256, 3)), jnp.float32)
    net_x = Network(cfg_x)
    variables = net_x.init(jax.random.PRNGKey(0), im0, im1)
    out_x = net_x.apply(variables, im0, im1, global_motion=True)
    out_p = Network(cfg_p).apply(variables, im0, im1, global_motion=True)
    np.testing.assert_allclose(
        np.asarray(out_p["I_t"]), np.asarray(out_x["I_t"]),
        atol=1e-5, rtol=1e-5,
    )


def test_deconv2x_lane_padded_matches_xla():
    """Half-res width 160 (pads to 256): the deconv's masked output
    must equal the unpadded ConvTranspose, and a following conv kernel
    chained on the padded HCW output must also stay exact."""
    from atmvfi_tpu.ops.conv_pallas import conv3x3_hcw_op

    rng = np.random.default_rng(17)
    B, H, W, Cin, Cout = 1, 8, 160, 8, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 2, Cin, Cout)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.random((Cout,)) * 0.5, jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, Cout, Cout)) * 0.2,
                     jnp.float32)
    b3 = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)

    xh = nhwc_to_hcw(x)
    yh = deconv2x_hcw_op(xh, k, b, s, True, True, W)
    yh = conv3x3_hcw_op(yh, k3, b3, b3, 2 * H, False, True, 2 * W)
    got = hcw_to_nhwc(yh, B, Cout, 2 * W)

    want = _ref_deconv(x, k, b, s)
    want = jax.lax.conv_general_dilated(
        want, k3, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b3
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4
    )


def test_model_odd_width_hcw_route_matches_xla():
    """64x240 lite, conv_impl='pallas': full/half-res stages route
    through lane-padded HCW kernels; outputs must match the XLA path."""
    from atmvfi_tpu.models import Network, get_config

    cfg_x = get_config("lite")
    cfg_p = dataclasses.replace(get_config("lite"), conv_impl="pallas")
    rng = np.random.default_rng(23)
    im0 = jnp.asarray(rng.random((1, 64, 240, 3)), jnp.float32)
    im1 = jnp.asarray(rng.random((1, 64, 240, 3)), jnp.float32)
    net_x = Network(cfg_x)
    variables = net_x.init(jax.random.PRNGKey(0), im0, im1)
    out_x = net_x.apply(variables, im0, im1, global_motion=True)
    out_p = Network(cfg_p).apply(variables, im0, im1, global_motion=True)
    np.testing.assert_allclose(
        np.asarray(out_p["I_t"]), np.asarray(out_x["I_t"]),
        atol=1e-5, rtol=1e-5,
    )
