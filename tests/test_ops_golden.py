"""Golden tests: core ops vs PyTorch semantics (CPU torch available)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from atmvfi_tpu import ops


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def _nhwc(t_nchw):
    return t_nchw.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("hw,out_hw", [((17, 23), (8, 11)), ((16, 24), (8, 12)),
                                       ((8, 12), (16, 24)), ((9, 7), (36, 28))])
def test_resize_bilinear_matches_torch(hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *hw, 5), dtype=np.float32)
    got = np.asarray(ops.resize_bilinear(jnp.asarray(x), *out_hw))
    want = _nhwc(F.interpolate(_nchw(x), size=out_hw, mode="bilinear", align_corners=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_downsample_scale_factor_parity():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 25, 31, 3), dtype=np.float32)
    got = np.asarray(ops.resize_scale(jnp.asarray(x), 0.5))
    want = _nhwc(F.interpolate(_nchw(x), scale_factor=0.5, mode="bilinear", align_corners=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_upsample_flow_parity():
    rng = np.random.default_rng(2)
    flow = rng.standard_normal((2, 9, 13, 2), dtype=np.float32) * 5
    got = np.asarray(ops.upsample_flow(jnp.asarray(flow), 2))
    t = _nchw(flow)
    want = _nhwc(F.interpolate(t, scale_factor=2, mode="bilinear", align_corners=True) * 2)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("flow_scale,C", [(0.0, 4), (0.3, 4), (3.7, 4),
                                          (25.0, 4), (3.7, 40)])
def test_flow_warp_matches_grid_sample(flow_scale, C):
    rng = np.random.default_rng(3)
    B, H, W = 2, 13, 17
    feat = rng.standard_normal((B, H, W, C), dtype=np.float32)
    flow = (rng.standard_normal((B, H, W, 2)) * flow_scale).astype(np.float32)

    got = np.asarray(ops.flow_warp(jnp.asarray(feat), jnp.asarray(flow)))

    # torch side: normalized grid_sample exactly as the reference wraps it
    # (flow_warp.py:26-60).
    tfeat = _nchw(feat)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    base = np.stack([xs, ys], axis=-1).astype(np.float32)  # [H,W,2] (x,y)
    coords = base[None] + flow  # [B,H,W,2]
    gx = 2 * coords[..., 0] / (W - 1) - 1
    gy = 2 * coords[..., 1] / (H - 1) - 1
    grid = torch.from_numpy(np.stack([gx, gy], axis=-1))
    want = _nhwc(
        F.grid_sample(tfeat, grid, mode="bilinear", padding_mode="zeros", align_corners=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_flow_warp_mask():
    B, H, W = 1, 6, 6
    feat = np.ones((B, H, W, 1), np.float32)
    flow = np.zeros((B, H, W, 2), np.float32)
    flow[..., 0] = 3.0  # pushes right half of samples out of range
    out, mask = ops.flow_warp(jnp.asarray(feat), jnp.asarray(flow), return_mask=True)
    mask = np.asarray(mask)
    assert mask[:, :, :3].all()
    assert not mask[:, :, 3:].any()
    np.testing.assert_allclose(np.asarray(out)[:, :, 3:], 0.0)


def test_window_partition_reverse_roundtrip():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, 16, 24, 7), dtype=np.float32)
    win = ops.window_partition(jnp.asarray(x), (8, 8))
    assert win.shape == (3 * 2 * 3, 64, 7)
    back = ops.window_reverse(win, (8, 8), 16, 24)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_window_partition_matches_reference():
    from refutil import import_reference

    ref = import_reference()
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 24, 24, 6), dtype=np.float32)
    got = np.asarray(ops.window_partition(jnp.asarray(x), (12, 12)))
    want = ref.attention.window_partition(torch.from_numpy(x), (12, 12)).numpy()
    np.testing.assert_array_equal(got, want)


def test_pad_mask_matches_reference():
    from refutil import import_reference

    ref = import_reference()
    h, w, ws = 10, 14, (8, 8)
    x = torch.zeros(1, h, w, 3)
    _, ref_mask = ref.attention.pad_if_needed(x, x.size(), ws)
    got = ops.attn_mask_for(h, w, ws, (0, 0))
    np.testing.assert_array_equal(np.asarray(got), ref_mask.numpy())


def test_no_mask_when_aligned_and_unshifted():
    assert ops.attn_mask_for(16, 16, (8, 8), (0, 0)) is None


def test_shift_mask_matches_reference_block():
    """Build the combined shift+pad mask via a reference ATMFormer forward."""
    from refutil import import_reference

    ref = import_reference()
    torch.manual_seed(0)
    h, w, dim = 10, 14, 16
    blk = ref.attention.ATMFormer(dim=dim, num_heads=4, window_size=8, shift_size=4)
    blk.eval()
    x = torch.rand(2, h, w, dim)
    with torch.no_grad():
        blk.forward(x, h, w, 1)
    ref_mask = blk.attn_mask.numpy()
    got = np.asarray(ops.attn_mask_for(h, w, (8, 8), (4, 4)))
    np.testing.assert_array_equal(got, ref_mask)


def test_relative_coords_matches_reference():
    from refutil import import_reference

    ref = import_reference()
    atm = ref.attention.AttentionToMotion(dim=8, window_size=5)
    want = atm.relative_coord.numpy()[0, 0]  # [2, N, N]
    got = np.asarray(ops.relative_coords(5))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_center_pad_depad_roundtrip():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 10, 14, 3), dtype=np.float32)
    padded = ops.center_pad(jnp.asarray(x), (8, 8))
    assert padded.shape == (2, 16, 16, 3)
    # parity of pad placement with F.pad in pad_if_needed (attention.py:58-61)
    want = F.pad(torch.from_numpy(x), (0, 0, 1, 1, 3, 3)).numpy()
    np.testing.assert_array_equal(np.asarray(padded), want)
    back = ops.center_depad(padded, 10, 14, (8, 8))
    np.testing.assert_array_equal(np.asarray(back), x)
