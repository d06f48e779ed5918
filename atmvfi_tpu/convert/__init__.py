"""Checkpoint conversion (PyTorch -> JAX)."""

from atmvfi_tpu.convert.torch_import import (
    convert_state_dict,
    load_torch_checkpoint,
    map_torch_key,
)

__all__ = ["convert_state_dict", "load_torch_checkpoint", "map_torch_key"]
