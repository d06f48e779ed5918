"""Benchmark harnesses: Vimeo90K, UCF101, SNU-FILM, Xiph, DAVIS.

Protocol-exact re-implementations of the reference scripts
(/root/reference/benchmark/test_{vimeo90k,ucf101,snufilm,xiph}.py,
davis-vid.py) — per-dataset quirks preserved (BASELINE.md):

  Vimeo90K:  global_motion=False, no padding (448x256 is /64),
             ssim_matlab on the float pred, PSNR in f64 numpy
  UCF101:    global_motion=False, SSIM computed on the ROUNDED uint8
             prediction (test_ucf101.py:102-104)
  SNU-FILM:  global_motion=True, pad divisor 64, 4 difficulty splits
  Xiph:      global_motion=True, pad divisor 32; categories resized-2k
             (2048x1080) and cropped-4k (center crop)
  DAVIS:     recursive 4x qualitative video (davis-vid.py:102-106)

Each runner takes an `InterpolationPipeline` and a data root, returns
mean PSNR/SSIM (+ per-split breakdown). TTA (doubly-flipped average) is
available everywhere, matching the --TTA flag.
"""
from __future__ import annotations

import glob
import math
import os
import time
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from atmvfi_tpu.evalkit import metrics
from atmvfi_tpu.infer.padder import InputPadder
from atmvfi_tpu.infer.pipeline import InterpolationPipeline
from atmvfi_tpu.utils.images import read_image
from atmvfi_tpu.utils.meters import AverageMeter


def _forward_tta(pipeline: InterpolationPipeline, x0, x1, tta: bool,
                 tta_swaporder: bool = False):
    """Doubly-flipped TTA average (+ optional frame-order swap average).

    The reference's --TTA path calls a nonexistent `model.inference`
    (test_vimeo90k.py:109-116, broken as shipped); this is the working
    equivalent of its intent.
    """
    flip = lambda t: t[:, ::-1, ::-1, :]
    pred = pipeline.interpolate_device(x0, x1)
    if tta:
        pred_f = pipeline.interpolate_device(flip(x0), flip(x1))
        pred = (pred + flip(pred_f)) / 2
    if tta_swaporder:
        pred_sa = pipeline.interpolate_device(x1, x0)
        pred_sa_f = pipeline.interpolate_device(flip(x1), flip(x0))
        pred_sa = (pred_sa + flip(pred_sa_f)) / 2
        pred = (pred + pred_sa) / 2
    return pred


def _to_unit(img: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(img, jnp.float32)[None] / 255.0


class _SteadyTimer:
    """Per-item forward timer excluding the first call per input shape.

    Runner results carry two timing views: `seconds`/`fps` are WALL
    CLOCK over the whole run — they include jit compiles (one per shape
    bucket; minutes through a device relay) and metric computation, so
    they under-report model throughput. `steady_fps` counts only
    post-compile forward calls (fenced with block_until_ready, metric
    math excluded) and is the number comparable against bench.py's
    device-true fps — up to the per-item host->device transfer, and up
    to relay fence slack (block_until_ready can return early there).
    """

    def __init__(self):
        self._seen = set()
        self.steady = 0.0
        self.n = 0

    def run(self, key, fn):
        t0 = time.time()
        out = jax.block_until_ready(fn())
        dt = time.time() - t0
        if key in self._seen:
            self.steady += dt
            self.n += 1
        else:
            self._seen.add(key)
        return out

    @property
    def fps(self) -> float:
        return self.n / self.steady if self.steady > 0 else 0.0


def run_vimeo90k(pipeline: InterpolationPipeline, path: str,
                 tta: bool = False, limit: Optional[int] = None,
                 progress: bool = True, tta_swaporder: bool = False) -> Dict:
    """test_vimeo90k.py protocol (global off enforced by caller)."""
    t_start = time.time()
    timer = _SteadyTimer()
    psnr_m, ssim_m = AverageMeter(), AverageMeter()
    with open(os.path.join(path, "tri_testlist.txt")) as f:
        names = [l.strip() for l in f if len(l.strip()) > 1]
    if limit:
        names = names[:limit]
    for i, name in enumerate(names):
        base = os.path.join(path, "sequences", name)
        I0 = _to_unit(read_image(os.path.join(base, "im1.png")))
        I1 = read_image(os.path.join(base, "im2.png"))
        I2 = _to_unit(read_image(os.path.join(base, "im3.png")))
        pred = timer.run(
            I0.shape, lambda: _forward_tta(pipeline, I0, I2, tta, tta_swaporder)
        )
        ssim = float(metrics.ssim_matlab(_to_unit(I1), pred))
        mid = np.asarray(pred[0], np.float64)
        gt = I1.astype(np.float64) / 255.0
        psnr = -10 * math.log10(((gt - mid) ** 2).mean())
        psnr_m.update(psnr)
        ssim_m.update(ssim)
        if progress:
            print(f"{i+1}/{len(names)} psnr {psnr_m.avg:.4f}", end="\r")
    dt = time.time() - t_start
    return {"psnr": psnr_m.avg, "ssim": ssim_m.avg, "n": len(names),
            "seconds": dt, "fps": len(names) / dt if dt else 0.0,
            "steady_fps": timer.fps}


def run_ucf101(pipeline: InterpolationPipeline, path: str,
               tta: bool = False, limit: Optional[int] = None) -> Dict:
    """test_ucf101.py protocol: SSIM on rounded prediction."""
    t_start = time.time()
    timer = _SteadyTimer()
    psnr_m, ssim_m = AverageMeter(), AverageMeter()
    dirs = sorted(os.listdir(path))
    if limit:
        dirs = dirs[:limit]
    for d in dirs:
        img0 = _to_unit(read_image(os.path.join(path, d, "frame_00.png")))
        img1 = _to_unit(read_image(os.path.join(path, d, "frame_02.png")))
        gt = _to_unit(read_image(os.path.join(path, d, "frame_01_gt.png")))
        pred = timer.run(
            img0.shape, lambda: _forward_tta(pipeline, img0, img1, tta)
        )
        rounded = jnp.round(pred * 255.0) / 255.0
        ssim = float(metrics.ssim_matlab(gt, rounded))
        out = np.asarray(rounded[0], np.float64)
        g = np.asarray(gt[0], np.float64)
        psnr = -10 * math.log10(((g - out) ** 2).mean())
        psnr_m.update(psnr)
        ssim_m.update(ssim)
    dt = time.time() - t_start
    return {"psnr": psnr_m.avg, "ssim": ssim_m.avg, "n": len(dirs),
            "seconds": dt, "fps": len(dirs) / dt if dt else 0.0,
            "steady_fps": timer.fps}


SNU_SPLITS = ("easy", "medium", "hard", "extreme")


def run_snufilm(pipeline: InterpolationPipeline, path: str,
                img_data_path: str = "", splits=SNU_SPLITS,
                tta: bool = False, limit: Optional[int] = None) -> Dict:
    """test_snufilm.py protocol: pad 64, four difficulty splits."""
    results = {}
    for split in splits:
        t_start = time.time()
        timer = _SteadyTimer()
        psnr_m, ssim_m = AverageMeter(), AverageMeter()
        file_list = []
        with open(os.path.join(path, f"test-{split}.txt")) as f:
            for line in f:
                line = line.replace("data/SNU-FILM/test/", img_data_path).strip()
                if line:
                    file_list.append(line.split(" "))
        if limit:
            file_list = file_list[:limit]
        for p0, p1, p2 in file_list:
            I0 = _to_unit(read_image(os.path.join(path, p0)))
            I1 = _to_unit(read_image(os.path.join(path, p1)))
            I2 = _to_unit(read_image(os.path.join(path, p2)))
            padder = InputPadder(I0.shape, divisor=64)
            I0p, I2p = padder.pad(I0, I2)
            pred = padder.unpad(timer.run(
                I0p.shape, lambda: _forward_tta(pipeline, I0p, I2p, tta)
            ))
            ssim = float(metrics.ssim_matlab(I1, pred))
            mid = np.asarray(pred[0], np.float64)
            gt = np.asarray(I1[0], np.float64)
            psnr = -10 * math.log10(((gt - mid) ** 2).mean())
            psnr_m.update(psnr)
            ssim_m.update(ssim)
        dt = time.time() - t_start
        results[split] = {"psnr": psnr_m.avg, "ssim": ssim_m.avg,
                          "n": len(file_list), "seconds": dt,
                          "fps": len(file_list) / dt if dt else 0.0,
                          "steady_fps": timer.fps}
    return results


XIPH_CLIPS = ("BoxingPractice", "Crosswalk", "DrivingPOV", "FoodMarket",
              "FoodMarket2", "RitualDance", "SquareAndTimelapse", "Tango")


def _area_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """INTER_AREA-style resize for integer downscale factors (PIL box)."""
    from PIL import Image

    return np.asarray(
        Image.fromarray(img).resize((out_w, out_h), Image.BOX), np.uint8
    )


def run_xiph(pipeline: InterpolationPipeline, root: str,
             categories=("resized-2k", "cropped-4k"), tta: bool = False,
             clips=XIPH_CLIPS, frame_limit: Optional[int] = None,
             resize_to=(2048, 1080), crop_margin=(540, 1024)) -> Dict:
    """test_xiph.py protocol: pad 32, even frames from odd neighbors.

    Expects `root/<clip>/NNN.png` frame dumps (the reference extracts
    these from the Netflix y4m sources with ffmpeg; zero-egress
    environments must pre-stage them).
    """
    results = {}
    for category in categories:
        t_start = time.time()
        timer = _SteadyTimer()
        psnr_m, ssim_m = AverageMeter(), AverageMeter()
        for clip in clips:
            d = os.path.join(root, clip)
            if not os.path.isdir(d):
                continue
            frames = range(2, 99, 2) if frame_limit is None else list(
                range(2, 99, 2)
            )[:frame_limit]
            for t in frames:
                try:
                    img0 = read_image(f"{d}/{t-1:03d}.png")
                    img1 = read_image(f"{d}/{t+1:03d}.png")
                    imgt = read_image(f"{d}/{t:03d}.png")
                except FileNotFoundError:
                    continue
                if category == "resized-2k":
                    img0, img1, imgt = (
                        _area_resize(im, *resize_to) for im in (img0, img1, imgt)
                    )
                else:  # cropped-4k center crop
                    mh, mw = crop_margin
                    img0, img1, imgt = (
                        im[mh:-mh, mw:-mw] for im in (img0, img1, imgt)
                    )
                x0, x1, xt = (_to_unit(im) for im in (img0, img1, imgt))
                padder = InputPadder(x0.shape, divisor=32)
                x0p, x1p = padder.pad(x0, x1)
                pred = padder.unpad(timer.run(
                    x0p.shape, lambda: _forward_tta(pipeline, x0p, x1p, tta)
                ))
                psnr_m.update(float(metrics.psnr(pred, xt)))
                ssim_m.update(float(metrics.ssim_matlab(pred, xt)))
        dt = time.time() - t_start
        results[category] = {"psnr": psnr_m.avg, "ssim": ssim_m.avg,
                             "n": psnr_m.count, "seconds": dt,
                             "fps": psnr_m.count / dt if dt else 0.0,
                             "steady_fps": timer.fps}
    return results


def run_davis_4x(pipeline: InterpolationPipeline, frames: List[np.ndarray]
                 ) -> List[np.ndarray]:
    """Recursive 4x slow-motion (davis-vid.py:102-106): between each
    consecutive pair emit [f_i, p025, p05, p075]."""
    out = []
    for a, b in zip(frames[:-1], frames[1:]):
        x0, x1 = _to_unit(a), _to_unit(b)
        padder = InputPadder(x0.shape, divisor=64)
        x0p, x1p = padder.pad(x0, x1)
        mid = pipeline.interpolate_device(x0p, x1p)
        q1 = pipeline.interpolate_device(x0p, mid)
        q3 = pipeline.interpolate_device(mid, x1p)
        out.append(a)
        for t in (q1, mid, q3):
            arr = np.asarray(
                jnp.round(jnp.clip(padder.unpad(t)[0], 0, 1) * 255)
            ).astype(np.uint8)
            out.append(arr)
    out.append(frames[-1])
    return out
