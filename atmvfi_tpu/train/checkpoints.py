"""Checkpoint save/load: params-only npz + full train-state via orbax.

The reference saves a wrapped dict of model/optimizer state + metric
metadata per epoch (trainer.py:438-446) and tolerates raw state_dicts
on load (demo_2x.py:27-36). Here:

  * `save_params_npz` / `load_params_npz` — portable params-only files
    (flattened '/'-joined keys), the serving format.
  * `save_train_state` / `restore_train_state` — orbax checkpoints of
    the full TrainState (params + optimizer + step) for resume.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict

_META_KEY = "__meta__"


def save_params_npz(path: str, variables: Dict, meta: Optional[Dict] = None) -> None:
    flat = flatten_dict(variables)
    arrays = {"/".join(k): np.asarray(v) for k, v in flat.items()}
    if meta is not None:
        arrays[_META_KEY] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
    np.savez(path, **arrays)


def load_params_npz(path: str):
    data = np.load(path, allow_pickle=False)
    flat = {}
    for key in data.files:
        if key == _META_KEY:
            continue
        flat[tuple(key.split("/"))] = data[key]
    return unflatten_dict(flat)


def load_params_meta(path: str) -> Dict:
    data = np.load(path, allow_pickle=False)
    if _META_KEY not in data.files:
        return {}
    return json.loads(bytes(data[_META_KEY]).decode())


def save_train_state(ckpt_dir: str, state: Any, step: int) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)


def restore_train_state(ckpt_dir: str, step: int, template: Any) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path, item=template)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None
