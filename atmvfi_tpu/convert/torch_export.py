"""JAX pytree -> PyTorch state_dict exporter (inverse of torch_import).

Lets users migrate checkpoints trained in this framework back to the
reference's `load_model_checkpoint` format (or diff them tensor by
tensor). Round-trip `convert_state_dict(to_torch_state_dict(v)) == v`
is tested.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np

from flax.traverse_util import flatten_dict

_SEQ_MODS = ("last_feat_extract", "down1", "down2", "down3", "refine_head")
_TRANSFORMER_MODS = (
    "feat_enhance_transformer",
    "local_motion_atmformer",
    "global_motion_atmformer",
)

# inverse of torch_import._transformer_inner
_INNER_INV = {
    "norm1/scale": ("norm1.weight", "direct"),
    "norm1/bias": ("norm1.bias", "direct"),
    "norm2/scale": ("norm2.weight", "direct"),
    "norm2/bias": ("norm2.bias", "direct"),
    "attn/q/kernel": ("attn.q.weight", "linear"),
    "attn/q/bias": ("attn.q.bias", "direct"),
    "attn/kv/kernel": ("attn.kv.weight", "linear"),
    "attn/kv/bias": ("attn.kv.bias", "direct"),
    "attn/qkv/kernel": ("attn.qkv.weight", "linear"),
    "attn/qkv/bias": ("attn.qkv.bias", "direct"),
    "attn/proj/kernel": ("attn.proj.weight", "linear"),
    "attn/proj/bias": ("attn.proj.bias", "direct"),
    "attn/mlp_fc1/kernel": ("attn.mlp.0.weight", "linear"),
    "attn/mlp_fc1/bias": ("attn.mlp.0.bias", "direct"),
    "attn/mlp_fc2/kernel": ("attn.mlp.2.weight", "linear"),
    "attn/mlp_fc2/bias": ("attn.mlp.2.bias", "direct"),
    "mlp/fc1/kernel": ("mlp.fc1.weight", "linear"),
    "mlp/fc1/bias": ("mlp.fc1.bias", "direct"),
    "mlp/fc2/kernel": ("mlp.fc2.weight", "linear"),
    "mlp/fc2/bias": ("mlp.fc2.bias", "direct"),
    "mlp/dwconv/dwconv/kernel": ("mlp.dwconv.dwconv.weight", "conv"),
    "mlp/dwconv/dwconv/bias": ("mlp.dwconv.dwconv.bias", "direct"),
}


def _inv_transform(kind: str, arr: np.ndarray) -> np.ndarray:
    if kind == "conv":  # HWIO -> OIHW
        return np.transpose(arr, (3, 2, 0, 1))
    if kind == "deconv":  # (kh,kw,I,O) -> (I,O,kh,kw)
        return np.transpose(arr, (2, 3, 0, 1))
    if kind == "linear":  # (in,out) -> (out,in)
        return np.transpose(arr, (1, 0))
    return arr


def _seq_inv(prefix: str, leaf: str):
    # ConvPReLU: conv/kernel, conv/bias, prelu
    if leaf == "conv/kernel":
        return f"{prefix}.0.weight", "conv"
    if leaf == "conv/bias":
        return f"{prefix}.0.bias", "direct"
    if leaf == "prelu":
        return f"{prefix}.1.weight", "direct"
    # Deconv2x: kernel, bias, prelu
    if leaf == "kernel":
        return f"{prefix}.0.weight", "deconv"
    if leaf == "bias":
        return f"{prefix}.0.bias", "direct"
    raise KeyError(leaf)


def map_flax_key(path: str):
    """'/'-joined flax param path -> (torch key, inverse transform kind)."""
    m = re.match(r"^feat_extracts_(\d+)/(.+)$", path)
    if m:
        k, leaf = int(m.group(1)), m.group(2)
        return _seq_inv(f"feat_extracts.{k // 2}.{k % 2}", leaf)

    m = re.match(
        r"^(cross_scale_feature_fusion|global_feature_fusion)/(.+)$", path
    )
    if m:
        mod, rest = m.group(1), m.group(2)
        m2 = re.match(r"^layers_(\d+)/(kernel|bias)$", rest)
        if m2:
            suffix = "weight" if m2.group(2) == "kernel" else "bias"
            kind = "conv" if suffix == "weight" else "direct"
            return f"{mod}.layers.{m2.group(1)}.{suffix}", kind
        table = {
            "proj/kernel": (f"{mod}.proj.weight", "conv"),
            "proj/bias": (f"{mod}.proj.bias", "direct"),
            "norm/scale": (f"{mod}.norm.weight", "direct"),
            "norm/bias": (f"{mod}.norm.bias", "direct"),
        }
        return table[rest]

    m = re.match(
        r"^(feat_enhance_transformer|local_motion_atmformer|"
        r"global_motion_atmformer)_(\d+)/(.+)$",
        path,
    )
    if m:
        mod, k, rest = m.group(1), m.group(2), m.group(3)
        name, kind = _INNER_INV[rest]
        return f"{mod}.{k}.{name}", kind

    m = re.match(r"^(local_motion_mlp|global_motion_mlp)_(\d+)(?:/(.+))?$", path)
    if m:
        mod, k, rest = m.group(1), int(m.group(2)), m.group(3)
        if k == 2:  # plain conv head: paths like ..._2/kernel
            suffix = "weight" if rest == "kernel" else "bias"
            kind = "conv" if rest == "kernel" else "direct"
            return f"{mod}.2.{suffix}", kind
        return _seq_inv(f"{mod}.{k}", rest)

    m = re.match(
        r"^(last_feat_extract|down1|down2|down3|refine_head)_(\d+)/(.+)$", path
    )
    if m:
        return _seq_inv(f"{m.group(1)}.{m.group(2)}", m.group(3))

    m = re.match(r"^refine_proj/(.+)$", path)
    if m:
        return _seq_inv("proj", m.group(1))

    m = re.match(r"^upsample(\d)_(\d)(?:/(.+))?$", path)
    if m:
        stage, idx, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        if stage == 0:
            # Sequential(deconv_seq, conv_seq, Conv2d)
            if idx == 0:
                return _seq_inv("upsample_pyramid.0.0", rest)
            if idx == 1:
                return _seq_inv("upsample_pyramid.0.1", rest)
            suffix = "weight" if rest == "kernel" else "bias"
            kind = "conv" if rest == "kernel" else "direct"
            return f"upsample_pyramid.0.2.{suffix}", kind
        # Sequential(PReLU, deconv_seq, conv_seq, Conv2d)
        if idx == 0:  # PReLU module: path 'upsampleS_0/prelu'
            return f"upsample_pyramid.{stage}.0.weight", "direct"
        if idx == 1:
            return _seq_inv(f"upsample_pyramid.{stage}.1", rest)
        if idx == 2:
            return _seq_inv(f"upsample_pyramid.{stage}.2", rest)
        suffix = "weight" if rest == "kernel" else "bias"
        kind = "conv" if rest == "kernel" else "direct"
        return f"upsample_pyramid.{stage}.3.{suffix}", kind

    m = re.match(r"^(up1|up2|up3)_(\d)/(.+)$", path)
    if m:
        mod, k, rest = m.group(1), int(m.group(2)), m.group(3)
        if k == 0:
            return _seq_inv(f"{mod}.0", rest)
        return _seq_inv(f"{mod}.1", rest)

    raise KeyError(f"no torch mapping for flax path {path!r}")


def to_torch_state_dict(variables) -> Dict[str, np.ndarray]:
    """flax variables (or bare params dict) -> torch-named ndarray dict."""
    params = variables.get("params", variables)
    out = {}
    for tup, arr in flatten_dict(params).items():
        path = "/".join(tup)
        # Deconv2x leaves are 'kernel'/'bias'/'prelu' directly under the
        # module; ConvPReLU nests under 'conv'. _seq_inv handles both,
        # but top-level 'prelu' of a Deconv2x maps to the seq's .1
        key, kind = map_flax_key(path)
        out[key] = _inv_transform(kind, np.asarray(arr, np.float32))
    return out


def save_torch_checkpoint(path: str, variables, meta=None) -> None:
    """Write a reference-format wrapped .pt checkpoint."""
    import torch

    sd = {k: torch.from_numpy(v.copy()) for k, v in to_torch_state_dict(variables).items()}
    torch.save(
        {
            "model_state_dict": sd,
            "optimizer_state_dict": None,
            "meta_data": meta or {},
            "train_metric": {},
            "val_metric": {},
        },
        path,
    )
