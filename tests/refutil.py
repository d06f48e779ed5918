"""Helpers to import the read-only PyTorch reference for golden tests.

The reference (/root/reference) depends on `timm` (only for DropPath /
to_2tuple / trunc_normal_) which is not installed; we provide a minimal
stub with identical behavior for the used symbols (drop_path is always 0
in the reference configs, so DropPath == Identity).
"""
import sys
import types

REF_ROOT = "/root/reference"


def install_timm_stub():
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    def to_2tuple(v):
        return tuple(v) if isinstance(v, (tuple, list)) else (v, v)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std)
            tensor.clamp_(a * std + mean, b * std + mean)
        return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def import_reference():
    """Import the reference network package; returns its module namespace."""
    install_timm_stub()
    for p in (REF_ROOT, REF_ROOT + "/network"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import network.attention as ref_attention  # noqa
    import network.network_base as ref_base  # noqa
    import network.network_lite as ref_lite  # noqa
    import flow_warp as ref_flow_warp  # noqa

    return types.SimpleNamespace(
        attention=ref_attention,
        network_base=ref_base,
        network_lite=ref_lite,
        flow_warp=ref_flow_warp,
    )
