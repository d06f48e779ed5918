"""Datasets and host-side input pipeline."""

from atmvfi_tpu.data.datasets import (
    SNUFilmDataset,
    VimeoDataset,
    X4KTest,
    X4KTrain,
)
from atmvfi_tpu.data.loader import DataLoader

__all__ = [
    "DataLoader",
    "SNUFilmDataset",
    "VimeoDataset",
    "X4KTest",
    "X4KTrain",
]
