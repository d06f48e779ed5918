"""Device mesh construction and sharding specs.

The reference is strictly single-GPU (SURVEY.md §2 checklist — no DDP /
NCCL anywhere), so this module is the TPU-native *additive* scaling
layer: an ('data', 'spatial') mesh where

  * 'data'    — batch-dimension data parallelism for training/eval
                (gradients all-reduce over ICI automatically)
  * 'spatial' — height-dimension sharding of activations for high-res
                inference; XLA SPMD inserts halo exchanges for convs
                and collectives for the warp gathers

Single-device falls out as a 1x1 mesh (no collectives emitted).

NOTE on the Pallas kernels: GSPMD cannot partition custom calls, so
under the AUTOMATIC partitioner the tile-slab warp / HCW conv kernels
would make XLA all-gather their operands — the gspmd serving path
therefore forces the XLA op set (`ATMVFIConfig(warp_impl="xla",
conv_impl="xla", tail_planar="off")`). The DEFAULT multi-chip serving
path avoids this entirely: `parallel/spatial.py`'s manual-SPMD
shard_map schedules run an ordinary single-device program per shard,
keeping every kernel (see its module docstring).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices=None) -> Mesh:
    """Build an ('data', 'spatial') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)  # default: pure data parallelism
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch sharded over 'data', H over 'spatial'."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None))


def data_only_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, None, None, None))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Single image sharded over H — high-res inference layout."""
    return NamedSharding(mesh, P(None, SPATIAL_AXIS, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Replicate the parameter pytree across the mesh."""
    return jax.device_put(params, replicated(mesh))


def shard_batch(arr, mesh: Mesh, spatial: bool = False):
    sh = batch_sharding(mesh) if spatial else data_only_sharding(mesh)
    return jax.device_put(arr, sh)
