"""Harness smoke tests on synthetic mini-datasets (lite, random weights)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atmvfi_tpu.evalkit import harness
from atmvfi_tpu.infer.pipeline import InterpolationPipeline
from atmvfi_tpu.models import Network, get_config
from atmvfi_tpu.utils.images import write_image


@pytest.fixture(scope="module")
def pipe():
    cfg = get_config("lite")
    net = Network(cfg)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy)
    return InterpolationPipeline(
        variables, variant="lite", dtype=jnp.float32, global_motion=False
    )


def _png(path, seed, hw):
    rng = np.random.default_rng(seed)
    write_image(str(path), (rng.random((*hw, 3)) * 255).astype(np.uint8))


def test_vimeo_harness(tmp_path, pipe):
    seq = tmp_path / "sequences" / "0001" / "0001"
    os.makedirs(seq)
    for i in (1, 2, 3):
        _png(seq / f"im{i}.png", i, (64, 112))
    (tmp_path / "tri_testlist.txt").write_text("0001/0001\n")
    res = harness.run_vimeo90k(pipe, str(tmp_path), progress=False)
    assert res["n"] == 1
    assert 0 < res["psnr"] < 100
    assert -1 <= res["ssim"] <= 1


def test_ucf_harness(tmp_path, pipe):
    d = tmp_path / "clip0"
    os.makedirs(d)
    _png(d / "frame_00.png", 0, (64, 64))
    _png(d / "frame_01_gt.png", 1, (64, 64))
    _png(d / "frame_02.png", 2, (64, 64))
    res = harness.run_ucf101(pipe, str(tmp_path))
    assert res["n"] == 1 and 0 < res["psnr"] < 100


def test_snufilm_harness(tmp_path, pipe):
    frames = tmp_path / "frames"
    os.makedirs(frames)
    names = []
    for i in range(3):
        _png(frames / f"f{i}.png", i, (70, 100))  # needs /64 padding
        names.append(f"frames/f{i}.png")
    (tmp_path / "test-easy.txt").write_text(" ".join(names) + "\n")
    res = harness.run_snufilm(pipe, str(tmp_path), "", splits=("easy",))
    assert res["easy"]["n"] == 1


def test_xiph_harness(tmp_path, pipe):
    clip = tmp_path / "BoxingPractice"
    os.makedirs(clip)
    for t in (1, 2, 3):
        _png(clip / f"{t:03d}.png", t, (2160 // 8, 4096 // 8))
    res = harness.run_xiph(
        pipe, str(tmp_path), categories=("resized-2k",), frame_limit=1,
        clips=("BoxingPractice",), resize_to=(128, 72),
    )
    assert res["resized-2k"]["n"] == 1


def test_davis_4x(pipe):
    rng = np.random.default_rng(0)
    frames = [(rng.random((64, 64, 3)) * 255).astype(np.uint8) for _ in range(3)]
    out = harness.run_davis_4x(pipe, frames)
    assert len(out) == 2 * 4 + 1
    np.testing.assert_array_equal(out[0], frames[0])
    np.testing.assert_array_equal(out[4], frames[1])
