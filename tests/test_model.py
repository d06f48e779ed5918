"""Model structure + full-forward parity tests (lite variant, CPU)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from atmvfi_tpu.convert import convert_state_dict, map_torch_key
from atmvfi_tpu.models import Network, get_config


def _param_count(variant):
    net = Network(get_config(variant))
    im = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    tree = jax.eval_shape(
        lambda a, b: net.init(jax.random.PRNGKey(0), a, b), im, im
    )
    return sum(x.size for x in jax.tree.leaves(tree))


def test_param_counts_match_reference():
    # README.md:69-70 — 51.56M base, 11.98M lite
    assert round(_param_count("base") / 1e6, 2) == 51.56
    assert round(_param_count("lite") / 1e6, 2) == 11.98


@pytest.fixture(scope="module")
def lite_pair():
    from refutil import import_reference

    ref = import_reference()
    torch.manual_seed(0)
    tmodel = ref.network_lite.Network(global_motion=True)
    tmodel.eval()
    variables = convert_state_dict(tmodel.state_dict())
    net = Network(get_config("lite"))
    return tmodel, net, variables


def test_converter_maps_every_key(lite_pair):
    tmodel, _, _ = lite_pair
    unmapped = [
        k for k in tmodel.state_dict()
        if not k.endswith(("relative_coord", "attn_mask", "HW"))
        and map_torch_key(k) is None
    ]
    assert unmapped == []


def test_converter_shapes_match_model(lite_pair):
    _, net, variables = lite_pair
    from flax.traverse_util import flatten_dict

    im = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    want = jax.eval_shape(
        lambda a, b: net.init(jax.random.PRNGKey(0), a, b), im, im
    )
    fw = flatten_dict(want)
    fg = flatten_dict(variables)
    assert set(fw) == set(fg)
    for k in fw:
        assert tuple(fw[k].shape) == tuple(fg[k].shape), k


@pytest.mark.parametrize("global_motion", [False, True])
def test_full_forward_parity(lite_pair, global_motion):
    tmodel, net, variables = lite_pair
    rng = np.random.default_rng(7)
    im0 = rng.random((1, 64, 96, 3), dtype=np.float32)
    im1 = rng.random((1, 64, 96, 3), dtype=np.float32)
    tmodel.global_motion = global_motion
    with torch.no_grad():
        tres = tmodel(
            torch.from_numpy(im0).permute(0, 3, 1, 2),
            torch.from_numpy(im1).permute(0, 3, 1, 2),
        )
    fwd = jax.jit(net.apply, static_argnames=("global_motion",))
    with jax.default_matmul_precision("highest"):
        jres = fwd(variables, jnp.asarray(im0), jnp.asarray(im1),
                   global_motion=global_motion)
    want = tres["I_t"].permute(0, 2, 3, 1).numpy()
    got = np.asarray(jres["I_t"])
    assert np.abs(got - want).max() < 5e-4
    # flows too (pre-clip path)
    wantf = tres["opt_flow_0"].permute(0, 2, 3, 1).numpy()
    gotf = np.asarray(jres["opt_flow_0"])
    assert np.abs(gotf - wantf).max() < 5e-4


def test_output_dict_keys(lite_pair):
    _, net, variables = lite_pair
    rng = np.random.default_rng(8)
    im = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    out = jax.jit(net.apply)(variables, im, im)
    expected = {
        "I_t", "im_t_list", "im0_warped_list", "im1_warped_list",
        "opt_flow_0", "opt_flow_1", "I_t_0", "I_t_1", "occ_mask1", "occ_mask2",
    }
    assert expected == set(out.keys())
    # global on: 1/16 + 1/8 + 3 decoder scales = 5 entries, fine->coarse
    assert len(out["im_t_list"]) == 5
    assert out["im_t_list"][0].shape == (1, 64, 64, 3)


# ----------------------------------------------------------------------
# base-variant parity (round-2: previously only validated on hardware)
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def base_pair():
    from refutil import import_reference

    ref = import_reference()
    torch.manual_seed(1)
    tmodel = ref.network_base.Network(global_motion=True)
    tmodel.eval()
    variables = convert_state_dict(tmodel.state_dict())
    net = Network(get_config("base"))
    return tmodel, net, variables


@pytest.mark.parametrize("global_motion", [False, True])
def test_full_forward_parity_base(base_pair, global_motion):
    """Full-forward base parity (exercises base-only wiring:
    last_feat_dim=288, global_mlp_hidden=768, refine_hidden=64)."""
    tmodel, net, variables = base_pair
    rng = np.random.default_rng(17)
    im0 = rng.random((1, 64, 96, 3), dtype=np.float32)
    im1 = rng.random((1, 64, 96, 3), dtype=np.float32)
    tmodel.global_motion = global_motion
    with torch.no_grad():
        tres = tmodel(
            torch.from_numpy(im0).permute(0, 3, 1, 2),
            torch.from_numpy(im1).permute(0, 3, 1, 2),
        )
    fwd = jax.jit(net.apply, static_argnames=("global_motion",))
    with jax.default_matmul_precision("highest"):
        jres = fwd(variables, jnp.asarray(im0), jnp.asarray(im1),
                   global_motion=global_motion)
    want = tres["I_t"].permute(0, 2, 3, 1).numpy()
    got = np.asarray(jres["I_t"])
    assert np.abs(got - want).max() < 5e-4
    wantf = tres["opt_flow_0"].permute(0, 2, 3, 1).numpy()
    gotf = np.asarray(jres["opt_flow_0"])
    assert np.abs(gotf - wantf).max() < 5e-4


def test_ensemble_parity(lite_pair):
    """Multiscale global ensemble (vectorized argmin+gather vs the
    reference's per-sample Python loop, network_lite.py:593-603) —
    ported from scripts/parity_ensemble.py into CI (VERDICT item 4)."""
    from refutil import import_reference

    ref = import_reference()
    torch.manual_seed(0)
    tmodel = ref.network_lite.Network(
        global_motion=True, ensemble_global_motion=True
    )
    tmodel.eval()
    variables = convert_state_dict(tmodel.state_dict())
    net = Network(get_config("lite"))

    rng = np.random.default_rng(0)
    B, H, W = 2, 128, 192
    im0 = rng.random((B, H, W, 3), dtype=np.float32)
    im1 = rng.random((B, H, W, 3), dtype=np.float32)
    with torch.no_grad():
        tres = tmodel(
            torch.from_numpy(im0).permute(0, 3, 1, 2).contiguous(),
            torch.from_numpy(im1).permute(0, 3, 1, 2).contiguous(),
        )
    fwd = jax.jit(
        net.apply, static_argnames=("global_motion", "ensemble_global_motion")
    )
    with jax.default_matmul_precision("highest"):
        jres = fwd(variables, jnp.asarray(im0), jnp.asarray(im1),
                   global_motion=True, ensemble_global_motion=True)
    want = tres["I_t"].permute(0, 2, 3, 1).numpy()
    got = np.asarray(jres["I_t"])
    assert np.abs(got - want).max() < 5e-4


def test_full_forward_parity_odd_resolution():
    """80x112: token grids 10x14 (local, win 8) and 5x7 (global, win 12)
    need center pad-masks AND shifted-window masks in the same forward
    (reference attention.py:28-62,275-307).

    Uses a FRESH reference model rather than the shared fixture: the
    reference caches each block's shifted-window mask keyed only on the
    padded token AREA (attention.py:279 `self.HW.item() == H_p * W_p`),
    and the global branch pads both 64x96 (4x6 tokens) and 80x112
    (5x7 tokens) to 12x12 = 144 — an area collision that makes a reused
    torch model serve a stale mask with the WRONG pad-mask baked in.
    Our masks are static per-trace constants, so only the reference
    side needs the fresh instance (a latent reference bug in the same
    family as SURVEY.md 2.27; not replicated by design)."""
    from refutil import import_reference

    ref = import_reference()
    torch.manual_seed(0)
    tmodel = ref.network_lite.Network(global_motion=True)
    tmodel.eval()
    variables = convert_state_dict(tmodel.state_dict())
    net = Network(get_config("lite"))
    rng = np.random.default_rng(23)
    im0 = rng.random((1, 80, 112, 3), dtype=np.float32)
    im1 = rng.random((1, 80, 112, 3), dtype=np.float32)
    tmodel.global_motion = True
    with torch.no_grad():
        tres = tmodel(
            torch.from_numpy(im0).permute(0, 3, 1, 2),
            torch.from_numpy(im1).permute(0, 3, 1, 2),
        )
    fwd = jax.jit(net.apply, static_argnames=("global_motion",))
    with jax.default_matmul_precision("highest"):
        jres = fwd(variables, jnp.asarray(im0), jnp.asarray(im1),
                   global_motion=True)
    want = tres["I_t"].permute(0, 2, 3, 1).numpy()
    got = np.asarray(jres["I_t"])
    assert np.abs(got - want).max() < 5e-4


def test_fast_mode_compose_full_res(lite_pair):
    """cfg.fast(): composed full-res warps run and stay close to the
    exact two-resampling path (tight here because random-init flows are
    small; device deviation is measured separately in PERF_NOTES)."""
    import dataclasses

    _, net, variables = lite_pair
    cfg_fast = dataclasses.replace(
        net.cfg, compose_full_res_warps=True
    )  # warp kernel path is separately tested; keep CPU warp impl
    rng = np.random.default_rng(31)
    im0 = jnp.asarray(rng.random((1, 64, 96, 3), dtype=np.float32))
    im1 = jnp.asarray(rng.random((1, 64, 96, 3), dtype=np.float32))
    exact = net.apply(variables, im0, im1, global_motion=True)
    fast = Network(cfg_fast).apply(variables, im0, im1, global_motion=True)
    assert fast["I_t"].shape == exact["I_t"].shape
    d = np.abs(np.asarray(fast["I_t"]) - np.asarray(exact["I_t"]))
    mse = float((d ** 2).mean())
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 30, psnr  # approximation, not divergence
    # fast mode's final flows carry the folded-in global component
    assert fast["opt_flow_0"].shape == exact["opt_flow_0"].shape


@pytest.mark.parametrize("global_motion", [True, False])
def test_planar_tail_matches_default(global_motion):
    """The planar full-res tail (tail_planar='on': HCW decoder exit,
    planar warps/blend, plane-ingesting refiner proj) must match the
    default NHWC tail numerically — same params, same math, different
    layouts (interpret-mode kernels on CPU). global_motion=False also
    covers the NHWC->planar conversion branch (no pre-align warp)."""
    import dataclasses

    cfg = dataclasses.replace(
        get_config("lite", dtype=jnp.float32),
        conv_impl="pallas", warp_impl="tiled",
    )
    net_off = Network(cfg)
    net_on = Network(dataclasses.replace(cfg, tail_planar="on"))
    rng = np.random.default_rng(5)
    im0 = jnp.asarray(rng.random((1, 64, 384, 3)), jnp.float32)
    im1 = jnp.asarray(rng.random((1, 64, 384, 3)), jnp.float32)
    variables = net_off.init(
        jax.random.PRNGKey(0), im0, im1, global_motion=True
    )
    out_off = net_off.apply(variables, im0, im1,
                            global_motion=global_motion)
    out_on = net_on.apply(variables, im0, im1,
                          global_motion=global_motion)
    for key in ("I_t", "I_t_0", "I_t_1", "opt_flow_0", "opt_flow_1",
                "occ_mask1"):
        np.testing.assert_allclose(
            np.asarray(out_on[key]), np.asarray(out_off[key]),
            atol=5e-5, rtol=1e-4, err_msg=key,
        )
    got = [np.asarray(t) for t in out_on["im_t_list"]]
    want = [np.asarray(t) for t in out_off["im_t_list"]]
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=5e-5, rtol=1e-4)


def test_planar_tail_gate_falls_back_at_unsupported_shapes():
    """The planar tail must only engage where the warp kernel applies
    (W%128, minimums); elsewhere the standard NHWC path runs."""
    import dataclasses

    cfg = dataclasses.replace(
        get_config("lite", dtype=jnp.float32),
        conv_impl="pallas", warp_impl="tiled", tail_planar="on",
    )
    net = Network(cfg)
    assert net._planar_tail_on(64, 384)
    assert not net._planar_tail_on(64, 400)   # W % 128 != 0
    assert not net._planar_tail_on(40, 384)   # H % 8 != 0
    assert not net._planar_tail_on(64, 256)   # W < 384
    off = Network(dataclasses.replace(cfg, tail_planar="off"))
    assert not off._planar_tail_on(64, 384)


def test_refiner_hcw_unet_matches_xla():
    """The refiner U-Net HCW chain (down2..up2 via s2/s1/deconv kernels,
    skips transposed in) must equal the plain XLA refiner — run
    directly on the refiner with synthetic inputs at a height where
    every stage gate passes (H=256 -> h1=128)."""
    import dataclasses

    cfg = dataclasses.replace(
        get_config("lite", dtype=jnp.float32),
        conv_impl="pallas", warp_impl="tiled",
    )
    net = Network(cfg)
    rng = np.random.default_rng(9)
    B, H, W = 1, 256, 384
    hid = cfg.refine_hidden
    fd2, fd3 = cfg.decoder_dims[1], cfg.decoder_dims[2]
    mo = 5
    feat = jnp.asarray(
        rng.standard_normal((B, H, W, fd3 + mo)) * 0.3, jnp.float32)
    imgs = [jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
            for _ in range(5)]
    # skips carry the decoder stage outputs MINUS the 5 motion channels
    skips = [
        jnp.asarray(rng.standard_normal(
            (B, H // 4, W // 4, cfg.decoder_dims[0])) * 0.3, jnp.float32),
        jnp.asarray(rng.standard_normal(
            (B, H // 2, W // 2, fd2)) * 0.3, jnp.float32),
    ]
    dummy = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy)

    def run_nhwc(self):
        return self.residual_refinement(feat, *imgs, skips)

    def run_planar(self):
        from atmvfi_tpu.ops import conv_pallas as cp
        from atmvfi_tpu.ops.warp_pallas import nhwc_to_planar

        feat_hcw = cp.nhwc_to_hcw(feat)
        planes15 = jnp.concatenate(
            [nhwc_to_planar(t) for t in imgs], axis=0
        )
        return self.residual_refinement_planar(
            feat_hcw, fd3 + mo, W, B, planes15, skips
        )

    want = net.apply(variables, method=run_nhwc)
    got = net.apply(variables, method=run_planar)
    assert want.shape == got.shape == (B, H, W, 3)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-4
    )


def test_refiner_down2_hcw_engages_and_matches_bf16():
    """The down2 HCW leg only fits VMEM in bf16 (the serving dtype; the
    f32 17-row slab at 144ch busts the budget and the gate falls back).
    Assert it ENGAGES in bf16 and matches the XLA refiner to bf16
    quantization noise."""
    import dataclasses

    cfg = dataclasses.replace(
        get_config("lite", dtype=jnp.bfloat16),
        conv_impl="pallas", warp_impl="tiled",
    )
    net = Network(cfg)
    B, H, W = 1, 256, 384
    fd2, fd3 = cfg.decoder_dims[1], cfg.decoder_dims[2]
    mo = 5
    rng = np.random.default_rng(10)
    dummy = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy)

    xh1 = jnp.asarray(
        rng.standard_normal((B * H // 2, 32, 384)) * 0.3, jnp.bfloat16)
    skips = [
        jnp.asarray(rng.standard_normal(
            (B, H // 4, W // 4, cfg.decoder_dims[0])) * 0.3, jnp.bfloat16),
        jnp.asarray(rng.standard_normal(
            (B, H // 2, W // 2, fd2)) * 0.3, jnp.bfloat16),
    ]

    def run_chain(self):
        return self._refine_down2_hcw(xh1, 192, B, skips, True)

    got = net.apply(variables, method=run_chain)
    assert got is not None, "down2 HCW leg did not engage in bf16"

    def run_xla(self):
        from atmvfi_tpu.ops import conv_pallas as cp

        feat1 = cp.hcw_to_nhwc(xh1, B, 32, 192)
        return _seq(self.down2, jnp.concatenate([feat1, skips[1]], -1))

    from atmvfi_tpu.models.network import _seq

    want = net.apply(variables, method=run_xla)
    assert got.shape == want.shape
    d = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    assert d.max() < 0.05 and d.mean() < 2e-3, (d.max(), d.mean())


def test_planar_tail_matches_default_bf16():
    """bf16 planar-vs-default parity: exercises the 16-channel padding
    granularity everywhere (e.g. the planes-only encoder conv pads 3
    planes to 16) and the refiner down2 HCW leg, which only engages in
    bf16. Tolerances are bf16 quantization noise — both sides run the
    same compute dtype."""
    import dataclasses

    cfg = dataclasses.replace(
        get_config("lite", dtype=jnp.bfloat16),
        conv_impl="pallas", warp_impl="tiled",
    )
    net_off = Network(cfg)
    net_on = Network(dataclasses.replace(cfg, tail_planar="on"))
    rng = np.random.default_rng(6)
    im0 = jnp.asarray(rng.random((1, 64, 384, 3)), jnp.float32)
    im1 = jnp.asarray(rng.random((1, 64, 384, 3)), jnp.float32)
    variables = net_off.init(
        jax.random.PRNGKey(0), im0, im1, global_motion=True
    )
    out_off = net_off.apply(variables, im0, im1, global_motion=True)
    out_on = net_on.apply(variables, im0, im1, global_motion=True)
    d = np.abs(
        np.asarray(out_on["I_t"], np.float32)
        - np.asarray(out_off["I_t"], np.float32)
    )
    assert d.max() < 0.06 and d.mean() < 3e-3, (d.max(), d.mean())
