"""Model configuration presets (base / lite).

The reference ships two hand-edited module trees
(/root/reference/network/network_base.py vs network_lite.py) that differ
only in widths and MLP ratios (SURVEY.md §2.16). Here both are presets
of one declarative config.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ATMVFIConfig:
    name: str = "base"
    # encoder pyramid dims, stride-2 between stages (network_base.py:92)
    hidden_dims: Tuple[int, ...] = (24, 48, 96, 192)
    pyramid_level: int = 4
    # transformer blocks
    num_heads: int = 8
    mlp_ratio: float = 4.0
    local_window: int = 8
    global_window: int = 12
    enhance_window: int = 8
    # head widths
    local_mlp_hidden_ratio: float = 0.75  # of fused_dim*2 (network_base.py:154)
    global_mlp_hidden: int = 768  # lite: concat_dim * 2 * 0.5 (network_lite.py:202)
    last_feat_extra: int = 96  # last_feat_dim = hidden_dims[-1] + extra
    refine_hidden: int = 64
    # numerics
    dtype: jnp.dtype = jnp.float32  # compute dtype (params stay f32)
    # attention backend: "auto" (fused transformer-BLOCK kernel on TPU
    # above the window gate, xla elsewhere), "pallas_block" (forced
    # block kernel: LN + qkv + frame swap + attention + proj +
    # residual in one pass), "pallas" (the round-4 attention-only
    # packed kernel), or "xla". interpret-mode off-TPU when forced.
    attention_impl: str = "auto"
    # backward-warp backend: "auto" (tiled Pallas kernel on TPU for
    # narrow tensors, xla otherwise), "tiled", or "xla"
    warp_impl: str = "auto"
    # full-res conv backend: "auto" (Pallas HCW conv3x3 runs on TPU at
    # qualifying shapes), "pallas" (forced; interpret off-TPU), "xla"
    conv_impl: str = "auto"
    # fast-serving approximation: skip the full-resolution global
    # pre-alignment warps and fold the global flow into the decoder's
    # final flows instead (one resampling instead of two). Saves two
    # full-res warps/frame; deviation measured in PERF_NOTES. Opt-in.
    compose_full_res_warps: bool = False
    # planar full-res tail: keep scale-0 activations in the Pallas
    # kernels' native layouts end-to-end (decoder feat HCW, images
    # planar [C, B*H, W], refiner proj ingests image planes via DMA) —
    # removes every full-res NHWC<->HCW transpose between the
    # pre-align warp and the refine head. "off" | "on" (forced; tests
    # run it in interpret mode) | "auto" (on when the HCW conv route
    # and tiled warp kernel are active). Default auto since the
    # 2026-08-19 device validation: grouped-planes kernel exact on
    # v5e (scripts/pallas_probe5f, tpu_planar_ab kernel cells) and
    # lite-4K frame time 527.9 -> 473.4 ms with the tail on.
    tail_planar: str = "auto"
    # admit 161-256 padded channels into the HCW conv routes. The
    # kernel wins these widths STANDALONE on both models, but in-model
    # the band is context-dependent: lite's 240-ch decoder pairs win
    # (+0.45-0.5 fps) while base's 208-ch sites lose ~21 ms/frame at
    # 1080p (v5e A/Bs, 2026-08-19) — per-preset measured default.
    hcw_wide_channels: bool = False
    # run each stride-1 HCW conv PAIR as ONE fused Pallas kernel (the
    # intermediate stays in VMEM). Device A/B 2026-08-20: the fused
    # form LOSES 1.1-1.5% in-model (recompute + lost cross-tile DMA
    # overlap > the saved HBM round trip), so the default is the
    # sequential two-kernel form. Config field (not an env var) so the
    # route matrix is enumerable; ATMVFI_HCW_DISABLE=fuse still kills.
    hcw_fuse_pairs: bool = False

    def fast(self) -> "ATMVFIConfig":
        """Serving profile: unchecked slab warps + composed full-res
        warps (VERDICT round-1 item 3). Exactness conds are skipped and
        the double full-res resampling is approximated; use the default
        config for parity/eval."""
        return dataclasses.replace(
            self, warp_impl="tiled_unchecked", compose_full_res_warps=True
        )

    # ---- derived quantities ----
    @property
    def fused_dim(self) -> int:
        """Local-branch token dim after cross-scale fusion (network_base.py:113)."""
        d = self.hidden_dims
        return d[-1] + d[-2] + 2 * d[-3]

    @property
    def last_feat_dim(self) -> int:
        return self.hidden_dims[-1] + self.last_feat_extra

    @property
    def global_dim(self) -> int:
        """Global-branch token dim (network_base.py:168)."""
        return self.last_feat_dim + self.hidden_dims[-1] + 2 * self.hidden_dims[-2]

    @property
    def motion_out_dim(self) -> int:
        return 5  # flow0 (2) + flow1 (2) + occlusion logit (1)

    @property
    def decoder_dims(self) -> Tuple[int, int, int]:
        """fused_dim1/2/3 of the coarse-to-fine decoder (network_base.py:198-200)."""
        fd = 2 * self.fused_dim
        return fd // 2, fd // 4, fd // 8

    def with_dtype(self, dtype) -> "ATMVFIConfig":
        return dataclasses.replace(self, dtype=dtype)

    def with_windows(self, local: int = None, global_: int = None,
                     enhance: int = None) -> "ATMVFIConfig":
        """Runtime window-size reconfiguration.

        Equivalent of the reference's __set_local_window_size__ /
        __set_global_window_size__ (network_base.py:262-270): window
        sizes only affect trace-time constants (masks, relative
        coords), never parameter shapes, so the same params work with
        any window size — build a Network with the new config and
        reuse the pytree.
        """
        kw = {}
        if local is not None:
            kw["local_window"] = local
        if global_ is not None:
            kw["global_window"] = global_
        if enhance is not None:
            kw["enhance_window"] = enhance
        return dataclasses.replace(self, **kw)


BASE = ATMVFIConfig()

LITE = ATMVFIConfig(
    name="lite",
    hidden_dims=(16, 32, 64, 96),
    mlp_ratio=2.0,
    local_mlp_hidden_ratio=0.5,
    global_mlp_hidden=352,  # concat_dim(352) * 2 * 0.5 (network_lite.py:202)
    hcw_wide_channels=True,
    last_feat_extra=32,
    refine_hidden=32,
)


def get_config(name: str, dtype=jnp.float32) -> ATMVFIConfig:
    cfg = {"base": BASE, "lite": LITE}[name]
    return cfg.with_dtype(dtype)
