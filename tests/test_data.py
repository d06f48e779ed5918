"""Dataset + loader tests on synthetic on-disk data."""
import os

import numpy as np
import pytest

from atmvfi_tpu.data import DataLoader, SNUFilmDataset, VimeoDataset, X4KTrain
from atmvfi_tpu.utils.images import write_image


def _write_png(path, seed, hw=(64, 96)):
    rng = np.random.default_rng(seed)
    img = (rng.random((*hw, 3)) * 255).astype(np.uint8)
    write_image(path, img)
    return img


@pytest.fixture()
def vimeo_root(tmp_path):
    root = tmp_path / "vimeo"
    seqs = ["00001/0001", "00001/0002", "00002/0001"]
    for i, s in enumerate(seqs):
        d = root / "sequences" / s
        os.makedirs(d)
        for j in (1, 2, 3):
            _write_png(str(d / f"im{j}.png"), seed=i * 10 + j, hw=(80, 120))
    (root / "tri_trainlist.txt").write_text("\n".join(seqs) + "\n")
    (root / "tri_testlist.txt").write_text(seqs[0] + "\n")
    return str(root)


def test_vimeo_train_augmented(vimeo_root):
    ds = VimeoDataset("train", vimeo_root, train_crop=64, seed=1)
    assert len(ds) == 3
    img0, gt, img1 = ds[0]
    assert img0.shape == (64, 64, 3)
    assert img0.dtype == np.float32
    assert 0.0 <= img0.min() and img0.max() <= 1.0


def test_vimeo_test_not_augmented(vimeo_root):
    ds = VimeoDataset("test", vimeo_root)
    img0, gt, img1 = ds[0]
    assert img0.shape == (80, 120, 3)


def test_loader_batches_ordered(vimeo_root):
    ds = VimeoDataset("test", vimeo_root)
    # repeat the single test item by re-listing
    ds.meta_data = ds.meta_data * 7
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True,
                        num_workers=3)
    batches = list(loader)
    assert len(batches) == 3 == len(loader)
    for b in batches:
        assert b[0].shape == (2, 80, 120, 3)


def test_loader_shuffles_between_epochs(vimeo_root):
    ds = VimeoDataset("train", vimeo_root, train_crop=64, seed=0)
    loader = DataLoader(ds, batch_size=1, shuffle=True, num_workers=1, seed=3)
    a = [b[0].sum() for b in loader]
    b = [b[0].sum() for b in loader]
    assert len(a) == len(b) == 3


def test_x4k_train(tmp_path):
    root = tmp_path / "x4k"
    d = root / "scene" / "clip0"
    os.makedirs(d)
    for i in range(65):
        _write_png(str(d / f"{i:05d}.png"), seed=i, hw=(96, 128))
    ds = X4KTrain(str(root), max_t_step_size=8, min_t_step_size=4,
                  random_crop=True, patch_size=64, seed=0)
    img0, gt, img1 = ds[0]
    assert img0.shape == (64, 64, 3)


def test_snufilm_pads_to_64(tmp_path):
    root = tmp_path / "snu"
    os.makedirs(root / "frames")
    paths = []
    for i in range(3):
        p = f"frames/f{i}.png"
        _write_png(str(root / p), seed=i, hw=(100, 130))
        paths.append(p)
    (root / "test-hard.txt").write_text(" ".join(paths) + "\n")
    ds = SNUFilmDataset("hard", str(root), "")
    i0, i1, i2 = ds[0]
    assert i0.shape == (128, 192, 3)  # padded to /64
