"""Harness protocol goldens vs the torch reference (VERDICT weak #4).

The per-dataset protocol quirks the harnesses exist for — SNU-FILM's
replicate pad to divisor 64 with global motion ON, UCF101's SSIM on
the ROUNDED uint8 prediction with global motion OFF, Vimeo90K's no-pad
forward — are gated here end to end: the reference model (random-init
lite, seed 0) runs the reference scripts' exact loops
(test_snufilm.py:114-146, test_ucf101.py:77-107, test_vimeo90k.py)
on synthetic triplets, and the converted pipeline runs our harness on
the same files. PSNR/SSIM must agree to cross-framework forward noise
(the metrics themselves are golden-tested to 2e-6 in
test_metrics_golden.py; a protocol bug — wrong divisor, missing
rounding, wrong global flag — shifts these numbers by whole dB).
"""
import math
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from atmvfi_tpu.convert.torch_import import convert_state_dict
from atmvfi_tpu.evalkit import harness
from atmvfi_tpu.infer.pipeline import InterpolationPipeline
from atmvfi_tpu.utils.images import write_image

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PSNR_TOL = 0.2    # dB; cross-framework forward noise only
SSIM_TOL = 2e-3


class RefPadder:
    """Verbatim InputPadder semantics (reference benchmark/utils.py:57-80;
    the file itself imports flow_vis/imageio, absent in this env)."""

    def __init__(self, dims, divisor=16):
        self.ht, self.wd = dims[-2:]
        pad_ht = (((self.ht // divisor) + 1) * divisor - self.ht) % divisor
        pad_wd = (((self.wd // divisor) + 1) * divisor - self.wd) % divisor
        self._pad = [pad_wd // 2, pad_wd - pad_wd // 2,
                     pad_ht // 2, pad_ht - pad_ht // 2]

    def pad(self, *inputs):
        return [F.pad(x, self._pad, mode="replicate") for x in inputs]

    def unpad(self, x):
        ht, wd = x.shape[-2:]
        c = [self._pad[2], ht - self._pad[3],
             self._pad[0], wd - self._pad[1]]
        return x[..., c[0]:c[1], c[2]:c[3]]


@pytest.fixture(scope="module")
def models():
    from refutil import import_reference

    ref = import_reference()
    torch.manual_seed(0)
    tmodel = ref.network_lite.Network(global_motion=True)
    tmodel.eval()
    variables = convert_state_dict(tmodel.state_dict())

    bench = os.path.join("/root/reference", "benchmark")
    if bench not in sys.path:
        sys.path.insert(0, bench)
    import pytorch_msssim  # noqa: E402  (torch-only module)

    return tmodel, variables, pytorch_msssim.ssim_matlab


def _triplet(seed, hw):
    rng = np.random.default_rng(seed)
    base = rng.random((*hw, 3))
    drift = np.roll(base, (2, -3), axis=(0, 1))
    mid = np.clip((base + drift) / 2 + rng.random((*hw, 3)) * 0.05, 0, 1)
    to8 = lambda a: (a * 255).astype(np.uint8)
    return to8(base), to8(mid), to8(drift)


def _t(img8):
    return (
        torch.tensor(img8.transpose(2, 0, 1)).float() / 255.0
    ).unsqueeze(0)


def test_snufilm_protocol_matches_reference(tmp_path, models):
    tmodel, variables, ssim_matlab = models
    tmodel.global_motion = True
    i0, gt, i2 = _triplet(3, (70, 100))  # needs /64 replicate padding

    # --- reference loop (test_snufilm.py:114-146) ---
    I0, I1, I2 = _t(i0), _t(gt), _t(i2)
    padder = RefPadder(I0.shape, divisor=64)
    I0p, I2p = padder.pad(I0, I2)
    with torch.no_grad():
        pred = tmodel.forward(I0p, I2p)["I_t"][0]
    pred = padder.unpad(pred)
    ssim_ref = float(ssim_matlab(I1, pred.unsqueeze(0)))
    out = pred.numpy().transpose(1, 2, 0)
    gt_f = gt / 255.0
    psnr_ref = -10 * math.log10(((gt_f - out) ** 2).mean())

    # --- our harness on the same files ---
    frames = tmp_path / "frames"
    os.makedirs(frames)
    for name, img in (("f0.png", i0), ("f1.png", gt), ("f2.png", i2)):
        write_image(str(frames / name), img)
    (tmp_path / "test-easy.txt").write_text(
        "frames/f0.png frames/f1.png frames/f2.png\n"
    )
    pipe = InterpolationPipeline(
        variables, variant="lite", dtype=jnp.float32, global_motion=True
    )
    res = harness.run_snufilm(pipe, str(tmp_path), "", splits=("easy",))

    assert abs(res["easy"]["psnr"] - psnr_ref) < PSNR_TOL, (
        res["easy"]["psnr"], psnr_ref,
    )
    assert abs(res["easy"]["ssim"] - ssim_ref) < SSIM_TOL


def test_ucf_protocol_matches_reference(tmp_path, models):
    tmodel, variables, ssim_matlab = models
    tmodel.global_motion = False
    i0, gt, i2 = _triplet(7, (64, 64))  # UCF: no padding, /64 sizes

    # --- reference loop (test_ucf101.py:77-107): SSIM on the ROUNDED
    # prediction, PSNR on round(pred*255)/255 ---
    I0, G, I2 = _t(i0), _t(gt), _t(i2)
    with torch.no_grad():
        pred = tmodel.forward(I0, I2)["I_t"][0]
    ssim_ref = float(
        ssim_matlab(G, torch.round(pred * 255).unsqueeze(0) / 255.0)
    )
    out = np.round(pred.numpy().transpose(1, 2, 0) * 255) / 255.0
    gt_f = gt / 255.0
    psnr_ref = -10 * math.log10(((gt_f - out) ** 2).mean())

    # --- our harness ---
    d = tmp_path / "clip0"
    os.makedirs(d)
    write_image(str(d / "frame_00.png"), i0)
    write_image(str(d / "frame_01_gt.png"), gt)
    write_image(str(d / "frame_02.png"), i2)
    pipe = InterpolationPipeline(
        variables, variant="lite", dtype=jnp.float32, global_motion=False
    )
    res = harness.run_ucf101(pipe, str(tmp_path))

    assert abs(res["psnr"] - psnr_ref) < PSNR_TOL, (res["psnr"], psnr_ref)
    assert abs(res["ssim"] - ssim_ref) < SSIM_TOL


def test_vimeo_protocol_matches_reference(tmp_path, models):
    tmodel, variables, ssim_matlab = models
    tmodel.global_motion = False  # test_vimeo90k.py:74
    i0, gt, i2 = _triplet(11, (64, 112))  # /64-friendly, no padding

    I0, G, I2 = _t(i0), _t(gt), _t(i2)
    with torch.no_grad():
        pred = tmodel.forward(I0, I2)["I_t"][0]
    ssim_ref = float(ssim_matlab(G, pred.unsqueeze(0)))
    out = pred.numpy().transpose(1, 2, 0)
    gt_f = gt / 255.0
    psnr_ref = -10 * math.log10(((gt_f - out) ** 2).mean())

    seq = tmp_path / "sequences" / "0001" / "0001"
    os.makedirs(seq)
    for name, img in (("im1.png", i0), ("im2.png", gt), ("im3.png", i2)):
        write_image(str(seq / name), img)
    (tmp_path / "tri_testlist.txt").write_text("0001/0001\n")
    pipe = InterpolationPipeline(
        variables, variant="lite", dtype=jnp.float32, global_motion=False
    )
    res = harness.run_vimeo90k(pipe, str(tmp_path), progress=False)

    assert abs(res["psnr"] - psnr_ref) < PSNR_TOL, (res["psnr"], psnr_ref)
    assert abs(res["ssim"] - ssim_ref) < SSIM_TOL
