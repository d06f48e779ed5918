"""Y4M video IO: roundtrips, demo --video mode, Xiph extraction."""
import os
import subprocess
import sys

import numpy as np
import pytest

from atmvfi_tpu.utils.video import (
    Y4MReader,
    Y4MWriter,
    extract_y4m_frames,
    prepare_xiph,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)


def _frames(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return [
        (rng.random((h, w, 3)) * 255).astype(np.uint8) for _ in range(n)
    ]


def test_color_roundtrip():
    rng = np.random.default_rng(1)
    rgb = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    back = ycbcr_to_rgb(rgb_to_ycbcr(rgb))
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 1


@pytest.mark.parametrize("cs", ["C444", "C420"])
def test_y4m_roundtrip(tmp_path, cs):
    if cs == "C420":
        # gray noise: constant chroma, so 4:2:0 subsampling is exact and
        # the test isolates container/roundtrip correctness
        rng = np.random.default_rng(0)
        frames = [
            np.repeat((rng.random((24, 32, 1)) * 255).astype(np.uint8), 3, 2)
            for _ in range(3)
        ]
    else:
        frames = _frames(3, 24, 32)
    path = str(tmp_path / "clip.y4m")
    with Y4MWriter(path, 32, 24, fps=(24, 1), colorspace=cs) as w:
        for f in frames:
            w.write(f)
    with Y4MReader(path) as r:
        assert (r.width, r.height) == (32, 24)
        assert r.fps == (24, 1)
        got = list(r)
    assert len(got) == 3
    for a, b in zip(got, frames):
        # +-2: 8-bit YCbCr quantization (C420 uses chroma-flat frames)
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 2


def test_y4m_420_smooth_content(tmp_path):
    """Flat-ish content survives 4:2:0 nearly losslessly."""
    h, w = 16, 32
    grad = np.linspace(40, 200, w, dtype=np.float32)
    frame = np.broadcast_to(grad[None, :, None], (h, w, 3)).astype(np.uint8)
    path = str(tmp_path / "flat.y4m")
    with Y4MWriter(path, w, h, colorspace="C420") as wr:
        wr.write(frame)
    got = next(iter(Y4MReader(path)))
    assert np.abs(got.astype(int) - frame.astype(int)).max() <= 4


def test_extract_frames_xiph_layout(tmp_path):
    frames = _frames(5, 16, 32, seed=2)
    clip = str(tmp_path / "TestClip.y4m")
    with Y4MWriter(clip, 32, 16) as w:
        for f in frames:
            w.write(f)
    n = extract_y4m_frames(clip, str(tmp_path / "out"), max_frames=4)
    assert n == 4
    # 1-indexed %03d names like the reference's ffmpeg extraction
    assert sorted(os.listdir(tmp_path / "out")) == [
        "001.png", "002.png", "003.png", "004.png"
    ]
    counts = prepare_xiph(str(tmp_path), str(tmp_path / "staged"),
                          clips=["TestClip", "Missing"])
    assert counts == {"TestClip": 5}
    assert os.path.exists(tmp_path / "staged" / "TestClip" / "005.png")


def test_demo_video_y4m_end_to_end(tmp_path):
    """demo --video round-trips a synthetic y4m (VERDICT round-1 item 6)."""
    frames = _frames(3, 40, 56, seed=3)
    src = str(tmp_path / "in.y4m")
    with Y4MWriter(src, 56, 40, fps=(12, 1), colorspace="C444") as w:
        for f in frames:
            w.write(f)
    out = str(tmp_path / "out")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # drop /root/.axon_site: its sitecustomize registers the axon TPU
    # backend in the subprocess regardless of JAX_PLATFORMS, and the
    # device claim hangs CI when the relay is down (this is a CPU test)
    env["PYTHONPATH"] = repo
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "cli", "demo_2x.py"),
         "--model_type", "lite", "--global_off", "--fp32",
         "--video", src, "--out", out],
        capture_output=True, text=True, env=env, timeout=1800, cwd=repo,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    with Y4MReader(out + ".y4m") as r:
        assert r.fps == (24, 1)  # 2x the input fps
        got = list(r)
    # N inputs -> 2*(N-1)+1 outputs; even outputs are the source frames
    assert len(got) == 5
    for i, src_f in zip((0, 2, 4), frames):
        assert np.abs(got[i].astype(int) - src_f.astype(int)).max() <= 2
