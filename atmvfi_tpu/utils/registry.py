"""Dotted-path config instantiation (reference benchmark/build_utils.py).

`build_from_cfg({'type': 'pkg.mod.Class', ...kwargs})` — the reference
keeps this vestigial helper around; here it is a tested utility.
"""
from __future__ import annotations

import importlib
from typing import Any, Dict


def build_from_cfg(config: Dict[str, Any]):
    cfg = dict(config)
    target = cfg.pop("type")
    module_name, _, attr = target.rpartition(".")
    if not module_name:
        raise ValueError(f"'type' must be a dotted path, got {target!r}")
    obj = getattr(importlib.import_module(module_name), attr)
    return obj(**cfg)
