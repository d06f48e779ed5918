"""Gradient accumulation + clipping paths, and a demo-CLI subprocess smoke."""
import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from atmvfi_tpu.train import PHASE1, Trainer, TrainerConfig


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    return [jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
            for _ in range(3)]


def test_grad_accumulation(batch):
    """MultiSteps: params move only every k-th step (trainer.py:35-36)."""
    import jax

    trainer = Trainer(
        TrainerConfig(phase=PHASE1, variant="lite", steps_per_epoch=4,
                      num_epochs=1, grad_accum=2)
    )
    im0, gt, im1 = batch
    p0 = jax.device_get(trainer.state.params["feat_extracts_0"]["conv"]["kernel"])
    trainer.state, _ = trainer._train_step(trainer.state, im0, gt, im1)
    p1 = jax.device_get(trainer.state.params["feat_extracts_0"]["conv"]["kernel"])
    np.testing.assert_array_equal(p0, p1)  # accumulating, no update yet
    trainer.state, _ = trainer._train_step(trainer.state, im0, gt, im1)
    p2 = jax.device_get(trainer.state.params["feat_extracts_0"]["conv"]["kernel"])
    assert np.abs(p2 - p1).max() > 0  # update applied on the 2nd step


def test_grad_clipping_runs(batch):
    trainer = Trainer(
        TrainerConfig(phase=PHASE1, variant="lite", steps_per_epoch=4,
                      num_epochs=1, clip_grad_norm=10.0)
    )
    im0, gt, im1 = batch
    state, metrics = trainer._train_step(trainer.state, im0, gt, im1)
    assert np.isfinite(float(metrics["loss"]))


def test_demo_cli_smoke(tmp_path):
    """The 2-frame demo runs end to end in a fresh interpreter."""
    from atmvfi_tpu.utils.images import write_image

    rng = np.random.default_rng(1)
    f0 = str(tmp_path / "f0.png")
    f1 = str(tmp_path / "f1.png")
    out = str(tmp_path / "mid.png")
    write_image(f0, (rng.random((48, 64, 3)) * 255).astype(np.uint8))
    write_image(f1, (rng.random((48, 64, 3)) * 255).astype(np.uint8))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # run without the axon sitecustomize so the CLI stays on local CPU
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run(
        [sys.executable, "cli/demo_2x.py", "--model_type", "lite",
         "--global_off", "--fp32", "--frame0", f0, "--frame1", f1,
         "--out", out],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)
    from atmvfi_tpu.utils.images import read_image

    assert read_image(out).shape == (48, 64, 3)
