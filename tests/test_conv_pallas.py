"""Pallas HCW conv3x3 kernel vs XLA conv golden (interpret mode, CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atmvfi_tpu.ops.conv_pallas import (
    conv3x3_hcw,
    conv3x3_nhwc_pallas,
    pack_conv3x3_weights,
)


def _ref_conv(x, k, b, slope):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    if slope is not None:
        y = jnp.maximum(y, 0) + slope * jnp.minimum(y, 0)
    return y


@pytest.mark.parametrize(
    "name,B,H,W,Cin,Cout,prelu",
    [
        ("single_tile", 1, 16, 256, 8, 8, True),
        ("wide", 1, 16, 1152, 8, 16, True),      # 3 lane tiles: edge+interior
        ("batch", 2, 16, 256, 8, 8, True),       # batch-boundary rows
        ("channels", 1, 16, 256, 16, 24, False),  # no PReLU epilogue
        ("odd_h", 1, 24, 256, 8, 8, True),       # H not multiple of 16
    ],
)
def test_conv3x3_matches_xla(name, B, H, W, Cin, Cout, prelu):
    rng = np.random.default_rng(hash(name) % 1000)
    x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    s = (
        jnp.asarray(rng.random((Cout,)) * 0.5, jnp.float32) if prelu else None
    )
    got = conv3x3_nhwc_pallas(x, k, b, s, interpret=True)
    want = _ref_conv(x, k, b, s)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4
    )


def test_conv3x3_hcw_direct():
    """HCW entry point with a prepacked kernel (the in-model form)."""
    rng = np.random.default_rng(3)
    B, H, W, Cin, Cout = 1, 32, 384, 8, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Cout,)), jnp.float32)
    x_hcw = x.reshape(B * H, W, Cin).transpose(0, 2, 1)
    y = conv3x3_hcw(x_hcw, pack_conv3x3_weights(k), b, None, H=H,
                    interpret=True)
    got = y.transpose(0, 2, 1).reshape(B, H, W, Cout)
    want = _ref_conv(x, k, b, None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4
    )


def test_model_conv_impl_pallas_matches_xla():
    """Full lite forward with the HCW conv runs (decoder stage-0 +
    refiner proj/head) vs the XLA path — same params, same outputs."""
    from atmvfi_tpu.models import Network, get_config

    cfg_x = get_config("lite")
    import dataclasses
    cfg_p = dataclasses.replace(get_config("lite"), conv_impl="pallas")
    rng = np.random.default_rng(0)
    im0 = jnp.asarray(rng.random((1, 64, 128, 3)), jnp.float32)
    im1 = jnp.asarray(rng.random((1, 64, 128, 3)), jnp.float32)
    net_x = Network(cfg_x)
    variables = net_x.init(jax.random.PRNGKey(0), im0, im1)
    out_x = net_x.apply(variables, im0, im1, global_motion=True)
    out_p = Network(cfg_p).apply(variables, im0, im1, global_motion=True)
    np.testing.assert_allclose(
        np.asarray(out_p["I_t"]), np.asarray(out_x["I_t"]),
        atol=5e-6, rtol=1e-5,
    )


def test_conv_op_gradients_match_xla():
    """conv3x3_hcw_op custom VJP vs grads of the plain XLA conv chain —
    the training path runs the Pallas forward at qualifying widths."""
    from atmvfi_tpu.ops.conv_pallas import conv3x3_hcw_op, nhwc_to_hcw

    rng = np.random.default_rng(11)
    B, H, W, Cin, Cout = 1, 16, 256, 8, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.random((Cout,)) * 0.5, jnp.float32)

    def loss_pl(x, k, b, s):
        xh = nhwc_to_hcw(x)
        y = conv3x3_hcw_op(xh, k, b, s, H, True, True)
        return jnp.sum(y ** 2)

    def loss_xla(x, k, b, s):
        y = _ref_conv(x, k, b, s)
        return jnp.sum(y ** 2)

    gp = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(x, k, b, s)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(x, k, b, s)
    for a, w in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), atol=5e-3, rtol=1e-3
        )


def test_infeasible_shapes_fall_back_not_raise():
    """W=640 at 392->392 f32 (base decoder mid stage at 2560-wide
    frames) has no VMEM-feasible tiling; the route helpers must report
    it instead of letting _pick_plan raise at trace time."""
    from atmvfi_tpu.ops.conv_pallas import conv_run_fits
    from atmvfi_tpu.ops.deconv_pallas import deconv_fits

    assert not conv_run_fits(640, [(392, 392)], jnp.float32)
    assert conv_run_fits(640, [(37, 37)], jnp.float32)
    assert deconv_fits(128, 104, 37, jnp.float32)
    assert not deconv_fits(1280, 2048, 2048, jnp.float32)


def test_model_route_skips_infeasible_conv_pair():
    """Regression: the 1/4-res base decoder pair (389ch) at W=640 used
    to crash tracing under conv_impl='pallas'/auto-on-TPU; the route
    must silently take the XLA path for it."""
    import dataclasses
    from atmvfi_tpu.models import Network, get_config

    cfg = dataclasses.replace(get_config("base"), conv_impl="pallas")
    net = Network(cfg)
    dummy = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy)

    rng = np.random.default_rng(3)
    feat = jnp.asarray(rng.standard_normal((1, 16, 640, 389)) * 0.1,
                       jnp.float32)

    def run(self, f):
        return self._conv_pair_hcw(self.upsample0[-2], self.upsample0[-1], f)

    out = net.apply(variables, feat, method=run)
    assert out.shape == (1, 16, 640, 389)


@pytest.mark.parametrize("W", [160, 240, 333])
def test_conv3x3_lane_padded_matches_xla(W):
    """Widths that aren't 128-multiples: lane padding + in-kernel
    w_true masking must stay exactly equal to the unpadded conv,
    including through a CHAIN of two kernels (the second reads the
    first's padded output)."""
    from atmvfi_tpu.ops.conv_pallas import (
        conv3x3_hcw_op, hcw_to_nhwc, nhwc_to_hcw,
    )

    rng = np.random.default_rng(W)
    B, H, Cin, Cmid, Cout = 1, 16, 8, 8, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, Cin, Cmid)) * 0.2,
                     jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, Cmid, Cout)) * 0.2,
                     jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((Cmid,)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    s1 = jnp.asarray(rng.random((Cmid,)) * 0.5, jnp.float32)

    xh = nhwc_to_hcw(x)  # pads lanes to the next 128-multiple
    yh = conv3x3_hcw_op(xh, k1, b1, s1, H, True, True, W)
    yh = conv3x3_hcw_op(yh, k2, b2, b2, H, False, True, W)
    got = hcw_to_nhwc(yh, B, Cout, W)
    want = _ref_conv(_ref_conv(x, k1, b1, s1), k2, b2, None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4
    )


def test_conv3x3_lane_padded_gradients():
    from atmvfi_tpu.ops.conv_pallas import conv3x3_hcw_op, nhwc_to_hcw

    rng = np.random.default_rng(5)
    B, H, W, C = 1, 16, 160, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.random((C,)) * 0.5, jnp.float32)

    def loss_pl(x, k, b, s):
        y = conv3x3_hcw_op(nhwc_to_hcw(x), k, b, s, H, True, True, W)
        return jnp.sum(y ** 2)

    def loss_xla(x, k, b, s):
        return jnp.sum(_ref_conv(x, k, b, s) ** 2)

    gp = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(x, k, b, s)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(x, k, b, s)
    for a, w in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), atol=5e-3, rtol=1e-3
        )


@pytest.mark.parametrize(
    "name,B,H,W,cf,np_,Cout,lane_pad_w",
    [
        ("proj_like", 1, 16, 384, 16, 15, 16, 0),   # feat(16)+15 planes
        ("wide", 1, 16, 1152, 8, 6, 8, 0),          # 3 lane tiles
        ("batch", 2, 16, 256, 8, 3, 8, 0),          # batch-boundary rows
        ("lane_padded", 1, 16, 384, 8, 6, 8, 128),  # w_true < W
    ],
)
def test_conv3x3_planes_matches_xla(name, B, H, W, cf, np_, Cout,
                                    lane_pad_w):
    """[HCW feat ‖ image planes] variant: planes DMA into slab channel
    slots; equals the XLA conv on the NHWC concat."""
    from atmvfi_tpu.ops.conv_pallas import (
        channel_pad,
        conv3x3_hcw_planes_op,
    )

    rng = np.random.default_rng(hash(name) % 1000)
    cin = cf + np_
    wt = W
    Wp = W + lane_pad_w
    x = jnp.asarray(rng.standard_normal((B, H, W, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, Cout)) * 0.2,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.random((Cout,)) * 0.5, jnp.float32)

    cfp = channel_pad(cf, jnp.float32)
    feat = jnp.pad(x[..., :cf], ((0, 0), (0, 0), (0, lane_pad_w),
                                 (0, cfp - cf)))
    feat_hcw = feat.reshape(B * H, Wp, cfp).transpose(0, 2, 1)
    planes = jnp.pad(
        x[..., cf:], ((0, 0), (0, 0), (0, lane_pad_w), (0, 0))
    ).transpose(3, 0, 1, 2).reshape(np_, B * H, Wp)

    y = conv3x3_hcw_planes_op(feat_hcw, planes, k, b, s, H, cf, True,
                              True, wt if lane_pad_w else None)
    got = y[:, :Cout, :wt].transpose(0, 2, 1).reshape(B, H, wt, Cout)
    want = _ref_conv(x, k, b, s)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4
    )


def test_conv3x3_planes_gradients():
    from atmvfi_tpu.ops.conv_pallas import conv3x3_hcw_planes_op

    rng = np.random.default_rng(11)
    B, H, W, cf, np_, Cout = 1, 16, 256, 8, 3, 8
    cin = cf + np_
    x = jnp.asarray(rng.standard_normal((B, H, W, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, Cout)) * 0.2,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.random((Cout,)) * 0.5, jnp.float32)
    feat_hcw = x[..., :cf].reshape(B * H, W, cf).transpose(0, 2, 1)
    planes = x[..., cf:].transpose(3, 0, 1, 2).reshape(np_, B * H, W)

    def f_kernel(k, b, s):
        y = conv3x3_hcw_planes_op(feat_hcw, planes, k, b, s, H, cf, True,
                                  True)
        return jnp.sum(y ** 2)

    def f_ref(k, b, s):
        xn = jnp.concatenate(
            [feat_hcw.transpose(0, 2, 1),
             planes.transpose(1, 2, 0)], axis=-1
        ).reshape(B, H, W, cin)
        y = _ref_conv(xn, k, b, s)
        yp = y.reshape(B * H, W, Cout).transpose(0, 2, 1)
        return jnp.sum(yp ** 2)

    g1 = jax.grad(f_kernel, argnums=(0, 1, 2))(k, b, s)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(k, b, s)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=2e-3, rtol=1e-3)


def test_conv3x3_planes_only_matches_xla():
    """Planes-only form (encoder first conv: raw frames by DMA)."""
    from atmvfi_tpu.ops.conv_pallas import conv3x3_planes_only_op

    rng = np.random.default_rng(21)
    B, H, W, C, Cout = 2, 16, 384, 3, 8
    x = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, C, Cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.random((Cout,)) * 0.5, jnp.float32)
    planes = x.transpose(3, 0, 1, 2).reshape(C, B * H, W)
    y = conv3x3_planes_only_op(planes, k, b, s, H, True, True)
    got = y[:, :Cout].transpose(0, 2, 1).reshape(B, H, W, Cout)
    want = _ref_conv(x, k, b, s)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4
    )


@pytest.mark.parametrize(
    "name,B,Hin,Win,Cin,Cout,wt",
    [
        ("single", 1, 32, 256, 8, 16, None),
        ("wide", 1, 32, 768, 8, 8, None),       # multiple lane tiles
        ("batch", 2, 32, 512, 16, 16, None),    # batch-boundary rows
        ("lane_padded", 1, 32, 512, 8, 8, 384), # w_true < W_in
        ("multi_tile", 1, 32, 2560, 8, 8, None),  # Wout=1280 -> TW=640,
                                                  # first/interior/last DMA
    ],
)
def test_conv3x3s2_matches_xla(name, B, Hin, Win, Cin, Cout, wt):
    """Stride-2 HCW kernel (encoder downsampling stages): three per-dx
    matmuls at input lane resolution + parity-split gathers +
    offset-slice adds select the strided output lanes."""
    from atmvfi_tpu.ops.conv_pallas import channel_pad, conv3x3s2_hcw_op

    rng = np.random.default_rng(hash(name) % 1000)
    w_in = Win if wt is None else wt
    x = jnp.asarray(rng.standard_normal((B, Hin, w_in, Cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.2,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.random((Cout,)) * 0.5, jnp.float32)
    cp_ = channel_pad(Cin, jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, Win - w_in), (0, cp_ - Cin)))
    x_hcw = xp.reshape(B * Hin, Win, cp_).transpose(0, 2, 1)
    y = conv3x3s2_hcw_op(x_hcw, k, b, s, Hin // 2, True, True, wt)
    w_out = (w_in + 1) // 2
    got = y[:, :Cout, :w_out].transpose(0, 2, 1).reshape(
        B, Hin // 2, w_out, Cout
    )
    want = jax.lax.conv_general_dilated(
        x, k, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    want = jnp.maximum(want, 0) + s * jnp.minimum(want, 0)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4
    )


def test_conv3x3s2_gradients():
    from atmvfi_tpu.ops.conv_pallas import conv3x3s2_hcw_op

    rng = np.random.default_rng(13)
    B, Hin, Win, C = 1, 32, 256, 8
    x = jnp.asarray(rng.standard_normal((B, Hin, Win, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.random((C,)) * 0.5, jnp.float32)
    x_hcw = x.reshape(B * Hin, Win, C).transpose(0, 2, 1)

    def f_kernel(k, b, s):
        return jnp.sum(
            conv3x3s2_hcw_op(x_hcw, k, b, s, Hin // 2, True, True) ** 2
        )

    def f_ref(k, b, s):
        y = jax.lax.conv_general_dilated(
            x, k, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        y = jnp.maximum(y, 0) + s * jnp.minimum(y, 0)
        yp = y.reshape(B * Hin // 2, Win // 2, C).transpose(0, 2, 1)
        return jnp.sum(yp ** 2)

    g1 = jax.grad(f_kernel, argnums=(0, 1, 2))(k, b, s)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(k, b, s)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=2e-3, rtol=1e-3)


def test_stack_dx_profitability_rule():
    from atmvfi_tpu.ops.conv_pallas import stack_dx_profitable

    # narrow outputs stack (3*Cout fits fewer 128-row MXU passes)
    assert stack_dx_profitable(16)
    assert stack_dx_profitable(32)
    assert stack_dx_profitable(64)
    assert stack_dx_profitable(80)
    # at/above the break-even the separate form is kept
    assert not stack_dx_profitable(96)
    assert not stack_dx_profitable(128)
    assert not stack_dx_profitable(240)


@pytest.mark.parametrize(
    "name,B,H,W,Cin,Cmid,Cout,prelu_b,wt",
    [
        ("single_tile", 1, 16, 256, 8, 8, 8, True, None),
        ("wide", 1, 16, 1152, 8, 16, 8, True, None),   # multi-tile DMA
        ("batch", 2, 16, 256, 8, 8, 16, True, None),   # batch-boundary rows
        ("no_prelu_b", 1, 16, 256, 16, 8, 8, False, None),
        ("lane_padded", 1, 16, 384, 8, 8, 8, True, 333),  # w_true < W
        ("stacked_mid", 1, 24, 256, 8, 32, 32, True, None),  # stack-dx hits
    ],
)
def test_conv3x3_pair_fused_matches_chain(name, B, H, W, Cin, Cmid, Cout,
                                          prelu_b, wt):
    """Fused conv3x3 pair (intermediate in VMEM scratch) vs chaining two
    conv3x3_hcw_op kernels, and vs the XLA reference conv chain."""
    from atmvfi_tpu.ops.conv_pallas import (
        conv3x3_hcw_op, conv3x3_pair_hcw_op, hcw_to_nhwc, nhwc_to_hcw,
    )

    rng = np.random.default_rng(hash(name) % 1000)
    w_in = W if wt is None else wt
    x = jnp.asarray(rng.standard_normal((B, H, w_in, Cin)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, Cin, Cmid)) * 0.2,
                     jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, Cmid, Cout)) * 0.2,
                     jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((Cmid,)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    s1 = jnp.asarray(rng.random((Cmid,)) * 0.5, jnp.float32)
    s2 = jnp.asarray(rng.random((Cout,)) * 0.5, jnp.float32)

    xh = nhwc_to_hcw(x)  # lane-pads to W
    got_h = conv3x3_pair_hcw_op(xh, k1, b1, s1, k2, b2, s2, H, True,
                                prelu_b, True, wt)
    chain = conv3x3_hcw_op(xh, k1, b1, s1, H, True, True, wt)
    chain = conv3x3_hcw_op(chain, k2, b2, s2, H, prelu_b, True, wt)
    # same products; tiling differences only reassociate reductions
    np.testing.assert_allclose(
        np.asarray(got_h), np.asarray(chain), atol=2e-5, rtol=2e-5
    )
    got = hcw_to_nhwc(got_h, B, Cout, w_in)
    want = _ref_conv(_ref_conv(x, k1, b1, s1), k2, b2,
                     s2 if prelu_b else None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4
    )


def test_conv3x3_pair_gradients_match_xla():
    """Fused-pair custom VJP (routes through the XLA-equivalent chain)
    vs grads of the plain XLA conv chain."""
    from atmvfi_tpu.ops.conv_pallas import conv3x3_pair_hcw_op, nhwc_to_hcw

    rng = np.random.default_rng(17)
    B, H, W, C = 1, 16, 256, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.2, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    s1 = jnp.asarray(rng.random((C,)) * 0.5, jnp.float32)
    s2 = jnp.asarray(rng.random((C,)) * 0.5, jnp.float32)

    def loss_pl(x, k1, b1, s1, k2, b2, s2):
        y = conv3x3_pair_hcw_op(nhwc_to_hcw(x), k1, b1, s1, k2, b2, s2,
                                H, True, True, True)
        return jnp.sum(y ** 2)

    def loss_xla(x, k1, b1, s1, k2, b2, s2):
        return jnp.sum(_ref_conv(_ref_conv(x, k1, b1, s1), k2, b2, s2) ** 2)

    gp = jax.grad(loss_pl, argnums=tuple(range(7)))(x, k1, b1, s1, k2,
                                                    b2, s2)
    gx = jax.grad(loss_xla, argnums=tuple(range(7)))(x, k1, b1, s1, k2,
                                                     b2, s2)
    for a, w in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(w), atol=5e-3, rtol=1e-3
        )


def test_model_fused_pair_route_matches_sequential():
    """Full lite forward: the fused conv-pair sites (opt-in via
    cfg.hcw_fuse_pairs=True; default is the sequential two-kernel form
    after the 2026-08-20 device A/B) agree to float tolerance under
    conv_impl='pallas'."""
    import dataclasses
    from atmvfi_tpu.models import Network, get_config

    cfg = dataclasses.replace(get_config("lite"), conv_impl="pallas")
    rng = np.random.default_rng(2)
    im0 = jnp.asarray(rng.random((1, 64, 128, 3)), jnp.float32)
    im1 = jnp.asarray(rng.random((1, 64, 128, 3)), jnp.float32)
    net = Network(cfg)
    variables = net.init(jax.random.PRNGKey(0), im0, im1)
    net_fused = Network(dataclasses.replace(cfg, hcw_fuse_pairs=True))
    out_fused = net_fused.apply(variables, im0, im1, global_motion=True)
    out_seq = net.apply(variables, im0, im1, global_motion=True)
    np.testing.assert_allclose(
        np.asarray(out_fused["I_t"]), np.asarray(out_seq["I_t"]),
        atol=5e-6, rtol=1e-5,
    )


def test_stacked_dx_is_identity_transform(monkeypatch):
    """The stacked [3*Cout, 3Cin] single-matmul form must equal the
    three-matmul form bit-for-bit in interpret mode — same products,
    same add order, only the MXU pass structure differs."""
    from atmvfi_tpu.ops.conv_pallas import (
        conv3x3_hcw_op, conv3x3s2_hcw_op, nhwc_to_hcw,
    )
    from atmvfi_tpu.ops.deconv_pallas import deconv2x_hcw_op

    rng = np.random.default_rng(7)
    B, H, W, C = 2, 16, 256, 16  # Cout=16 -> stacked when enabled
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    xh = nhwc_to_hcw(x)
    k3 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.2, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((2, 2, C, C)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.random((C,)) * 0.5, jnp.float32)

    def all_ops():
        return (
            conv3x3_hcw_op(xh, k3, b, s, H, True, True),
            conv3x3s2_hcw_op(xh, k3, b, s, H // 2, True, True),
            deconv2x_hcw_op(xh, k2, b, s, True, True),
        )

    stacked = all_ops()
    monkeypatch.setenv("ATMVFI_NO_STACKDX", "1")
    separate = all_ops()
    for a, c in zip(stacked, separate):
        # same products and add order; only the dot's M-tiling differs.
        # On the CPU interpret backend XLA reassociates the K-reduction
        # differently per M shape, so allow reduction-order ulps.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), atol=2e-5, rtol=2e-5
        )


def test_hcw_op_family_bf16_grads():
    """bf16 activations + f32 params through every differentiable HCW
    entry point: round 5 found the VJP surrogates' preferred_element_
    type=f32 conv made the transpose rule see mixed dtypes and raise —
    a latent training-on-TPU crash (bf16 full-res phases). Gradient
    must simply trace and produce finite values."""
    import jax

    from atmvfi_tpu.ops import conv_pallas as cp
    from atmvfi_tpu.ops import deconv_pallas as dp

    rng = np.random.default_rng(0)
    B, H, W, cin, cout = 1, 16, 128, 16, 16
    cpad = cp.channel_pad(cin, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B * H, cpad, W)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)

    losses = {
        "hcw": lambda: jax.grad(
            lambda x, k: (cp.conv3x3_hcw_op(x, k, b, s, H, True, True, W)
                          .astype(jnp.float32) ** 2).mean(),
            argnums=(0, 1),
        )(x, k),
        "s2": lambda: jax.grad(
            lambda xs, k: (cp.conv3x3s2_hcw_op(xs, k, b, s, 16, True,
                                               True, 256)
                           .astype(jnp.float32) ** 2).mean(),
            argnums=(0, 1),
        )(jnp.asarray(rng.standard_normal((32, cpad, 256)), jnp.bfloat16), k),
        "deconv": lambda: jax.grad(
            lambda x, kd: (dp.deconv2x_hcw_op(x, kd, b, s, True, True, W)
                           .astype(jnp.float32) ** 2).mean(),
            argnums=(0, 1),
        )(x, jnp.asarray(rng.standard_normal((2, 2, cin, cout)) * 0.1,
                         jnp.float32)),
    }
    for name, fn in losses.items():
        grads = fn()
        for gr in grads:
            assert np.isfinite(np.asarray(gr, np.float32)).all(), name
