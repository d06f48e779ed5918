"""Tests: InputPadder golden vs torch, flow IO roundtrip, viz, registry."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from atmvfi_tpu.infer.padder import InputPadder
from atmvfi_tpu.utils import flow_io
from atmvfi_tpu.utils.flow_viz import flow_to_color
from atmvfi_tpu.utils.registry import build_from_cfg
from atmvfi_tpu.utils.visualize import montage, save_prediction


@pytest.mark.parametrize("hw,divisor", [((100, 150), 64), ((448, 256), 64),
                                        ((1080, 2048), 32), ((97, 61), 16)])
def test_input_padder_matches_reference(hw, divisor):
    h, w = hw
    rng = np.random.default_rng(0)
    img = rng.random((1, h, w, 3), dtype=np.float32)

    padder = InputPadder(img.shape, divisor=divisor)
    padded = np.asarray(padder.pad(jnp.asarray(img)))

    # torch reference: replicate pad with the same split (utils.py:57-69)
    t = torch.from_numpy(img).permute(0, 3, 1, 2)
    pad_ht = (((h // divisor) + 1) * divisor - h) % divisor
    pad_wd = (((w // divisor) + 1) * divisor - w) % divisor
    tpad = [pad_wd // 2, pad_wd - pad_wd // 2, pad_ht // 2, pad_ht - pad_ht // 2]
    want = F.pad(t, tpad, mode="replicate").permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(padded, want)

    back = np.asarray(padder.unpad(jnp.asarray(padded)))
    np.testing.assert_array_equal(back, img)


def test_flo_roundtrip(tmp_path):
    flow = np.random.default_rng(1).standard_normal((7, 9, 2)).astype(np.float32)
    p = str(tmp_path / "a.flo")
    flow_io.write_flow(p, flow)
    np.testing.assert_array_equal(flow_io.read_flow(p), flow)
    np.testing.assert_array_equal(flow_io.read(p), flow)


def test_pfm_roundtrip(tmp_path):
    img = np.random.default_rng(2).random((5, 6, 3)).astype(np.float32)
    p = str(tmp_path / "a.pfm")
    flow_io.write_pfm(p, img)
    got, scale = flow_io.read_pfm(p)
    np.testing.assert_allclose(got, img)


def test_float3_roundtrip(tmp_path):
    data = np.random.default_rng(3).random((4, 5, 2)).astype(np.float32)
    p = str(tmp_path / "a.float3")
    flow_io.write_float3(p, data)
    got = flow_io.read_float3(p)
    assert got.shape == data.shape
    np.testing.assert_allclose(got, data)


def test_flow_viz_shapes():
    flow = np.zeros((8, 10, 2), np.float32)
    flow[..., 0] = 3.0
    img = flow_to_color(flow)
    assert img.shape == (8, 10, 3) and img.dtype == np.uint8
    # uniform flow -> uniform color
    assert (img == img[0, 0]).all()


def test_montage_and_save_prediction(tmp_path):
    rng = np.random.default_rng(4)
    im = rng.random((16, 16, 3)).astype(np.float32)
    flow = rng.standard_normal((16, 16, 2)).astype(np.float32)
    path = save_prediction(im, im, im, im, str(tmp_path), 0, psnr=30.0,
                           flow0=flow, flow1=flow, occ=im[..., :1])
    from atmvfi_tpu.utils.images import read_image

    got = read_image(path)
    assert got.shape[0] % 16 == 0 and got.shape[2] == 3


def test_registry_builds():
    meter = build_from_cfg({"type": "atmvfi_tpu.utils.meters.AverageMeter"})
    meter.update(2.0)
    assert meter.avg == 2.0
    with pytest.raises(ValueError):
        build_from_cfg({"type": "NoDots"})
