"""PyTorch checkpoint -> JAX pytree converter.

Reproduces `load_model_checkpoint` semantics (reference demo_2x.py:24-51,
train.py:24-48): accepts either a wrapped dict
``{'model_state_dict': ..., 'optimizer_state_dict': ..., 'meta_data': ...}``
or a raw state_dict, strips the resolution-dependent cached buffers
(``relative_coord``, ``attn_mask``, ``HW`` — they are static trace-time
constants in this framework), and maps every torch tensor onto the flax
param tree with the appropriate layout transform:

  Conv2d          [O, I, kh, kw]  -> HWIO [kh, kw, I, O]
  ConvTranspose2d [I, O, 2, 2]    -> [2, 2, I, O]   (Deconv2x kernel)
  Linear          [out, in]       -> [in, out]
  PReLU           [C]             -> [C]
  LayerNorm weight/bias           -> scale/bias
"""
from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np

from flax.traverse_util import unflatten_dict

STRIP_BUFFER_SUFFIXES = ("relative_coord", "attn_mask", "HW")

_CONV = "conv"
_DECONV = "deconv"
_LINEAR = "linear"
_DIRECT = "direct"


def _transform(kind: str, arr: np.ndarray) -> np.ndarray:
    if kind == _CONV:
        return np.transpose(arr, (2, 3, 1, 0))
    if kind == _DECONV:
        return np.transpose(arr, (2, 3, 0, 1))
    if kind == _LINEAR:
        return np.transpose(arr, (1, 0))
    return arr


def _seq_block(flax_prefix: str, rest: str) -> Optional[Tuple[str, str]]:
    """Map a `conv()`-helper Sequential entry: `.0.weight` etc."""
    m = re.match(r"^0\.(weight|bias)$", rest)
    if m:
        if m.group(1) == "weight":
            return f"{flax_prefix}/conv/kernel", _CONV
        return f"{flax_prefix}/conv/bias", _DIRECT
    if rest == "1.weight":
        return f"{flax_prefix}/prelu", _DIRECT
    return None


def _deconv_block(flax_prefix: str, rest: str) -> Optional[Tuple[str, str]]:
    """Map a `deconv()`-helper Sequential entry (ConvTranspose2d + PReLU)."""
    if rest == "0.weight":
        return f"{flax_prefix}/kernel", _DECONV
    if rest == "0.bias":
        return f"{flax_prefix}/bias", _DIRECT
    if rest == "1.weight":
        return f"{flax_prefix}/prelu", _DIRECT
    return None


def _transformer_inner(rest: str) -> Optional[Tuple[str, str]]:
    """Map ATMFormer / RefineBottleneck internals."""
    table = {
        "norm1.weight": ("norm1/scale", _DIRECT),
        "norm1.bias": ("norm1/bias", _DIRECT),
        "norm2.weight": ("norm2/scale", _DIRECT),
        "norm2.bias": ("norm2/bias", _DIRECT),
        "attn.q.weight": ("attn/q/kernel", _LINEAR),
        "attn.q.bias": ("attn/q/bias", _DIRECT),
        "attn.kv.weight": ("attn/kv/kernel", _LINEAR),
        "attn.kv.bias": ("attn/kv/bias", _DIRECT),
        "attn.qkv.weight": ("attn/qkv/kernel", _LINEAR),
        "attn.qkv.bias": ("attn/qkv/bias", _DIRECT),
        "attn.proj.weight": ("attn/proj/kernel", _LINEAR),
        "attn.proj.bias": ("attn/proj/bias", _DIRECT),
        "attn.mlp.0.weight": ("attn/mlp_fc1/kernel", _LINEAR),
        "attn.mlp.0.bias": ("attn/mlp_fc1/bias", _DIRECT),
        "attn.mlp.2.weight": ("attn/mlp_fc2/kernel", _LINEAR),
        "attn.mlp.2.bias": ("attn/mlp_fc2/bias", _DIRECT),
        "mlp.fc1.weight": ("mlp/fc1/kernel", _LINEAR),
        "mlp.fc1.bias": ("mlp/fc1/bias", _DIRECT),
        "mlp.fc2.weight": ("mlp/fc2/kernel", _LINEAR),
        "mlp.fc2.bias": ("mlp/fc2/bias", _DIRECT),
        "mlp.dwconv.dwconv.weight": ("mlp/dwconv/dwconv/kernel", _CONV),
        "mlp.dwconv.dwconv.bias": ("mlp/dwconv/dwconv/bias", _DIRECT),
    }
    return table.get(rest)


def map_torch_key(key: str) -> Optional[Tuple[str, str]]:
    """torch state_dict key -> (flax '/'-joined path, transform kind).

    Returns None for keys that should be skipped (cached buffers).
    """
    if key.endswith(STRIP_BUFFER_SUFFIXES):
        return None

    # encoder: feat_extracts.{stage}.{conv}.{0|1}...
    m = re.match(r"^feat_extracts\.(\d+)\.(\d+)\.(.+)$", key)
    if m:
        i, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        return _seq_block(f"feat_extracts_{2 * i + j}", rest)

    # cross-scale fusion blocks
    m = re.match(
        r"^(cross_scale_feature_fusion|global_feature_fusion)\.(.+)$", key
    )
    if m:
        mod, rest = m.group(1), m.group(2)
        m2 = re.match(r"^layers\.(\d+)\.(weight|bias)$", rest)
        if m2:
            k, wb = int(m2.group(1)), m2.group(2)
            if wb == "weight":
                return f"{mod}/layers_{k}/kernel", _CONV
            return f"{mod}/layers_{k}/bias", _DIRECT
        table = {
            "proj.weight": (f"{mod}/proj/kernel", _CONV),
            "proj.bias": (f"{mod}/proj/bias", _DIRECT),
            "norm.weight": (f"{mod}/norm/scale", _DIRECT),
            "norm.bias": (f"{mod}/norm/bias", _DIRECT),
        }
        return table.get(rest)

    # transformer block lists
    m = re.match(
        r"^(feat_enhance_transformer|local_motion_atmformer|global_motion_atmformer)"
        r"\.(\d+)\.(.+)$",
        key,
    )
    if m:
        mod, k, rest = m.group(1), int(m.group(2)), m.group(3)
        inner = _transformer_inner(rest)
        if inner is None:
            return None
        return f"{mod}_{k}/{inner[0]}", inner[1]

    # conv-sequence towers ending in a plain 1x1/3x3 conv
    m = re.match(
        r"^(local_motion_mlp|global_motion_mlp)\.(\d+)\.(.+)$", key
    )
    if m:
        mod, k, rest = m.group(1), int(m.group(2)), m.group(3)
        if k == 2:  # plain nn.Conv2d head
            wb = rest
            if wb == "weight":
                return f"{mod}_2/kernel", _CONV
            return f"{mod}_2/bias", _DIRECT
        return _seq_block(f"{mod}_{k}", rest)

    # simple ConvPReLU sequences
    m = re.match(
        r"^(last_feat_extract|down1|down2|down3|refine_head)\.(\d+)\.(.+)$", key
    )
    if m:
        mod, k, rest = m.group(1), int(m.group(2)), m.group(3)
        return _seq_block(f"{mod}_{k}", rest)

    # refiner projection (torch top-level name `proj`)
    m = re.match(r"^proj\.(.+)$", key)
    if m:
        return _seq_block("refine_proj", m.group(1))

    # upsample pyramid stages
    m = re.match(r"^upsample_pyramid\.(\d+)\.(\d+)\.(.+)$", key)
    if m:
        stage, idx, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        if stage == 0:
            # Sequential(deconv_seq, conv_seq, Conv2d)
            if idx == 0:
                return _deconv_block("upsample0_0", rest)
            if idx == 1:
                return _seq_block("upsample0_1", rest)
            if idx == 2:
                if rest == "weight":
                    return "upsample0_2/kernel", _CONV
                return "upsample0_2/bias", _DIRECT
        else:
            # Sequential(PReLU, deconv_seq, conv_seq, Conv2d)
            if idx == 0 and rest == "weight":
                return f"upsample{stage}_0/prelu", _DIRECT
            if idx == 1:
                return _deconv_block(f"upsample{stage}_1", rest)
            if idx == 2:
                return _seq_block(f"upsample{stage}_2", rest)
            if idx == 3:
                if rest == "weight":
                    return f"upsample{stage}_3/kernel", _CONV
                return f"upsample{stage}_3/bias", _DIRECT
        return None

    # refiner decoder
    m = re.match(r"^(up1|up2|up3)\.(\d+)\.(.+)$", key)
    if m:
        mod, k, rest = m.group(1), int(m.group(2)), m.group(3)
        if k == 0:
            return _deconv_block(f"{mod}_0", rest)
        return _seq_block(f"{mod}_1", rest)

    return None


def convert_state_dict(state_dict: Dict[str, "np.ndarray"], strict: bool = True):
    """torch state_dict (tensors or ndarrays) -> flax params dict."""
    flat = {}
    unmapped = []
    for key, value in state_dict.items():
        if key.endswith(STRIP_BUFFER_SUFFIXES):
            continue
        mapped = map_torch_key(key)
        if mapped is None:
            unmapped.append(key)
            continue
        path, kind = mapped
        arr = value.detach().cpu().numpy() if hasattr(value, "detach") else np.asarray(value)
        flat[tuple(path.split("/"))] = _transform(kind, arr.astype(np.float32))
    if unmapped and strict:
        raise KeyError(f"unmapped torch keys: {unmapped[:10]} (+{len(unmapped)-10 if len(unmapped)>10 else 0} more)")
    return {"params": unflatten_dict(flat)}


def load_torch_checkpoint(path: str, strict: bool = True):
    """Load a reference .pt checkpoint file -> (flax variables, meta dict).

    Handles both the wrapped trainer checkpoint format
    (trainer.py:438-446) and a raw state_dict (demo_2x.py:27-36).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    meta = {}
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        state_dict = ckpt["model_state_dict"]
        meta = {k: v for k, v in ckpt.items() if k != "model_state_dict"
                and k != "optimizer_state_dict"}
    else:
        state_dict = ckpt
    return convert_state_dict(state_dict, strict=strict), meta
