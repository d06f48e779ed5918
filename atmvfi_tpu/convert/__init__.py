"""Checkpoint conversion (PyTorch -> JAX)."""

from atmvfi_tpu.convert.torch_import import (
    convert_state_dict,
    load_torch_checkpoint,
    map_torch_key,
)
from atmvfi_tpu.convert.torch_export import (
    save_torch_checkpoint,
    to_torch_state_dict,
)

__all__ = [
    "convert_state_dict",
    "load_torch_checkpoint",
    "map_torch_key",
    "save_torch_checkpoint",
    "to_torch_state_dict",
]
