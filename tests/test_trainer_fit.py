"""Full trainer loop smoke: fit() on synthetic data with checkpointing."""
import glob
import os

import numpy as np

import jax.numpy as jnp

from atmvfi_tpu.train import PHASE1, Trainer, TrainerConfig


class _SynthDataset:
    def __init__(self, n=4, hw=(64, 64), seed=0):
        self.n = n
        self.hw = hw
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return tuple(
            self.rng.random((*self.hw, 3), dtype=np.float32) for _ in range(3)
        )


def test_fit_two_epochs_checkpoints(tmp_path):
    from atmvfi_tpu.data import DataLoader

    ds = _SynthDataset(n=4)
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=1)
    trainer = Trainer(
        TrainerConfig(
            phase=PHASE1, variant="lite", steps_per_epoch=len(loader),
            num_epochs=2, checkpoint_dir=str(tmp_path),
        )
    )
    logs = []
    history = trainer.fit([loader], loader, max_iters=2,
                          log_fn=lambda m: logs.append(m))
    assert len(history) == 2
    assert all(np.isfinite(h["train"]["loss"]) for h in history)
    ckpts = glob.glob(os.path.join(str(tmp_path), "*.npz"))
    assert len(ckpts) == 2
    # checkpoint is loadable and has metric metadata
    from atmvfi_tpu.train.checkpoints import load_params_meta, load_params_npz

    variables = load_params_npz(ckpts[0])
    assert "params" in variables
    meta = load_params_meta(ckpts[0])
    assert meta["phase"] == "phase1_local"
    assert "psnr" in meta["val_metric"]


def test_multi_loader_alternation(tmp_path):
    from atmvfi_tpu.data import DataLoader

    ds_a = _SynthDataset(n=2, seed=1)
    ds_b = _SynthDataset(n=2, seed=2)
    la = DataLoader(ds_a, batch_size=1, num_workers=1)
    lb = DataLoader(ds_b, batch_size=1, num_workers=1)
    trainer = Trainer(
        TrainerConfig(phase=PHASE1, variant="lite", steps_per_epoch=2,
                      num_epochs=2, checkpoint_dir=str(tmp_path))
    )
    history = trainer.fit([la, lb], la, max_iters=1, log_fn=lambda m: None)
    assert len(history) == 2
