"""ATM-VFI network — TPU-native re-design (base & lite presets).

Functional parity with the reference orchestration
(/root/reference/network/network_base.py:88-712, network_lite.py) in
NHWC / JAX form:

  * Frames are stacked on the batch axis so all shared towers run once
    on [2B, ...] (as the reference does at network_base.py:451).
  * `global_motion` / `ensemble_global_motion` are static call
    arguments; one jitted XLA graph exists per (variant, resolution
    bucket, flags) combination.
  * The per-sample Python argmin of the multiscale ensemble
    (network_base.py:593-603) is vectorized into argmin + gather.

All heavy compute is MXU-friendly: convs NHWC, window attention as
batched matmuls, the k2s2 transposed convs via `lax.conv_transpose`
(or the Pallas HCW deconv kernel at full-res stages — layers.py
Deconv2x, ops/deconv_pallas.py).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from atmvfi_tpu import ops
from atmvfi_tpu.models.config import ATMVFIConfig
from atmvfi_tpu.models.fusion import CrossScaleFeatureFusion
from atmvfi_tpu.models.layers import (
    ATMFormer,
    ConvPReLU,
    Deconv2x,
    PlainConv,
    PReLU,
    RefineBottleneck,
)


def _hcw_route_on(name: str) -> bool:
    """Debug escape hatch:
    ATMVFI_HCW_DISABLE=enc,encp,dec,pair,proj,up2,up3,head,tail,fuse
    turns individual HCW/planar Pallas route sites off (read at trace
    time). 'tail' kills the whole planar full-res tail; 'encp' the
    planes-fed encoder chain inside it; 'fuse' makes every fused
    conv-pair site run its two kernels sequentially instead."""
    import os

    dis = os.environ.get("ATMVFI_HCW_DISABLE", "")
    return name not in [s for s in dis.split(",") if s]


def _plain_conv(features: int, kernel: int, in_features: int, dtype, name: str):
    """Bare conv with PyTorch-default init (param tree == nn.Conv's)."""
    return PlainConv(
        features, in_features=in_features, kernel=kernel, dtype=dtype,
        name=name,
    )


def _seq(modules: Sequence, x):
    for m in modules:
        x = m(x)
    return x


class Network(nn.Module):
    """The full VFI model. __call__(im0, im1) -> output dict.

    im0, im1: [B, H, W, 3] float in [0, 1]; H, W divisible by 16
    (use infer.InputPadder for arbitrary sizes; benchmark protocol pads
    to 64 or 32 per dataset).
    """

    cfg: ATMVFIConfig

    def setup(self):
        c = self.cfg
        dt = c.dtype
        d = c.hidden_dims

        # --- pyramid encoder (network_base.py:99-110) ---
        extract = []
        for i in range(c.pyramid_level):
            extract.append(ConvPReLU(d[i], stride=1 if i == 0 else 2, dtype=dt))
            extract.append(ConvPReLU(d[i], stride=1, dtype=dt))
        self.feat_extracts = extract

        # --- local motion branch ---
        fused = c.fused_dim
        self.cross_scale_feature_fusion = CrossScaleFeatureFusion(
            in_dims=tuple(d[1:]), fused_dim=fused, dtype=dt
        )
        self.feat_enhance_transformer = [
            RefineBottleneck(
                dim=fused, window_size=c.enhance_window, shift_size=s,
                num_heads=c.num_heads, mlp_ratio=c.mlp_ratio, dtype=dt,
                attn_impl=c.attention_impl,
            )
            for s in (0, c.enhance_window // 2)
        ]
        self.local_motion_atmformer = [
            ATMFormer(
                dim=fused, window_size=c.local_window, shift_size=s,
                num_heads=c.num_heads, mlp_ratio=c.mlp_ratio, dtype=dt,
                attn_impl=c.attention_impl,
            )
            for s in (0, c.local_window // 2)
        ]
        lm_hidden = int(2 * fused * c.local_mlp_hidden_ratio)
        lm_in = 2 * fused + c.num_heads
        self.local_motion_mlp = [
            ConvPReLU(lm_hidden, dtype=dt),
            ConvPReLU(lm_hidden, dtype=dt),
            _plain_conv(c.motion_out_dim, 1, lm_hidden, dt, "local_motion_mlp_2"),
        ]
        del lm_in

        # --- global motion branch ---
        lfd = c.last_feat_dim
        self.last_feat_extract = [
            ConvPReLU(lfd, stride=2, dtype=dt),
            ConvPReLU(lfd, stride=1, dtype=dt),
        ]
        gdim = c.global_dim
        self.global_feature_fusion = CrossScaleFeatureFusion(
            in_dims=(d[-2], d[-1], lfd), fused_dim=gdim, dtype=dt
        )
        self.global_motion_atmformer = [
            ATMFormer(
                dim=gdim, window_size=c.global_window, shift_size=s,
                num_heads=c.num_heads, mlp_ratio=c.mlp_ratio, dtype=dt,
                attn_impl=c.attention_impl,
            )
            for s in (0, c.global_window // 2)
        ]
        gm_hidden = c.global_mlp_hidden
        self.global_motion_mlp = [
            ConvPReLU(gm_hidden, dtype=dt),
            ConvPReLU(gm_hidden, dtype=dt),
            _plain_conv(c.motion_out_dim, 1, gm_hidden, dt, "global_motion_mlp_2"),
        ]

        # --- coarse-to-fine decoder (network_base.py:203-221) ---
        fd1, fd2, fd3 = c.decoder_dims
        mo = c.motion_out_dim
        self.upsample0 = [
            Deconv2x(fd1 + mo, dtype=dt),
            ConvPReLU(fd1 + mo, dtype=dt),
            _plain_conv(fd1 + mo, 3, fd1 + mo, dt, "upsample0_2"),
        ]
        self.upsample1 = [
            PReLU(fd1 + mo),
            Deconv2x(fd2 + mo, dtype=dt),
            ConvPReLU(fd2 + mo, dtype=dt),
            _plain_conv(fd2 + mo, 3, fd2 + mo, dt, "upsample1_3"),
        ]
        self.upsample2 = [
            PReLU(fd2 + mo),
            Deconv2x(fd3 + mo, dtype=dt),
            ConvPReLU(fd3 + mo, dtype=dt),
            _plain_conv(fd3 + mo, 3, fd3 + mo, dt, "upsample2_3"),
        ]

        # --- residual refinement U-Net (network_base.py:223-260) ---
        hid = c.refine_hidden
        self.refine_proj = ConvPReLU(hid, dtype=dt)
        self.down1 = [ConvPReLU(hid, stride=2, dtype=dt)]
        self.down2 = [
            ConvPReLU(2 * hid, stride=2, dtype=dt),
            ConvPReLU(2 * hid, dtype=dt),
        ]
        self.down3 = [
            ConvPReLU(4 * hid, stride=2, dtype=dt),
            ConvPReLU(4 * hid, dtype=dt),
            ConvPReLU(4 * hid, dtype=dt),
        ]
        self.up1 = [Deconv2x(2 * hid, dtype=dt), ConvPReLU(2 * hid, dtype=dt)]
        self.up2 = [Deconv2x(2 * hid, dtype=dt), ConvPReLU(hid, dtype=dt)]
        self.up3 = [Deconv2x(hid, dtype=dt)]
        self.refine_head = [ConvPReLU(hid, dtype=dt), ConvPReLU(3, dtype=dt)]

    def _warp(self, feature, flow):
        from atmvfi_tpu.ops.warp_pallas import flow_warp_dispatch

        return flow_warp_dispatch(feature, flow, impl=self.cfg.warp_impl)

    def _warp_pair(self, f0, f1, flow0, flow1):
        """Two same-shape warps under one exactness cond (pair sites:
        pyramid pre-align, ensemble alignmentness)."""
        from atmvfi_tpu.ops.warp_pallas import flow_warp_pair_dispatch

        return flow_warp_pair_dispatch(f0, f1, flow0, flow1,
                                       impl=self.cfg.warp_impl)

    def _warp_blend(self, im0, im1, flow0, flow1, occ):
        """(I_t, I_t_0, I_t_1) via the fused dual-warp+blend kernel.

        I_t is produced in ONE kernel (single output stream, in-kernel
        blend); the warped frames come from independent dispatches that
        XLA drops when only I_t is consumed (the serving jit).
        """
        from atmvfi_tpu.ops.warp_pallas import flow_warp_blend

        return flow_warp_blend(im0, im1, flow0, flow1, occ,
                               impl=self.cfg.warp_impl)

    # ------------------------------------------------------------------
    # sub-towers
    # ------------------------------------------------------------------
    def shared_feat_extraction(self, x, img_planes=None):
        """[2B, H, W, 3] -> coarsest feat + [1/2, 1/4, 1/8] scale feats.

        The first stage's two stride-1 convs run at full resolution on
        both frames. Routes for that first pair, in preference order:

        * planes route (img_planes=[3, 2B*H, W] given — the planar
          tail): the raw frames enter the first conv's slab by DMA
          (conv3x3_planes_only_op) and the second conv runs HCW — no
          NHWC->HCW transpose of the full-res images exists, and the
          input path differs entirely from the one the unexplained
          Mosaic divergence (below) rides on.
        * HCW kernel-pair route: on under 'auto' at qualifying shapes.
          (History: this site diverged in-model on Mosaic for round 2
          — demo golden 58.0 -> 50.2 dB — while standalone probes were
          exact. Root-caused 2026-08-19: the trigger was the weights
          arriving as jit ARGUMENTS with a small first-conv pack —
          scripts/tpu_argsrc2.py k10 — not the model context; fixed at
          the source by pack_conv3x3_weights' provenance defense, and
          the full argsrc matrix now measures exact on v5e.)
        * XLA NHWC convs (fallback)."""
        from atmvfi_tpu.ops import conv_pallas as cp

        conv_a, conv_b = self.feat_extracts[0], self.feat_extracts[1]
        B2, H, W = x.shape[0], x.shape[1], x.shape[2]
        use, interp = cp.resolve_conv_impl(self.cfg.conv_impl, x.shape)
        pair_ch = [(3, conv_a.features),
                   (conv_a.features, conv_b.features)]
        pair_ok = (
            use
            and cp.hcw_channels_profitable(pair_ch, self.cfg.dtype)
            and cp.conv_run_fits(cp.lane_pad(W), pair_ch, self.cfg.dtype)
        )
        enc_route = _hcw_route_on("enc") and (
            pair_ok or self.cfg.conv_impl == "pallas"
        )
        planes_route = (img_planes is not None and pair_ok
                        and _hcw_route_on("encp"))
        feats = []
        xh = None  # HCW carry of the planes route (+ its true dims)
        for i in range(self.cfg.pyramid_level):
            if i == 0 and planes_route:
                wp = cp.lane_pad(W)
                pl_in = img_planes.astype(self.cfg.dtype)
                if wp != W:
                    pl_in = jnp.pad(pl_in, ((0, 0), (0, 0), (0, wp - W)))
                xh = conv_a(None, hcw=(3, H, W), interpret=interp,
                            planes=pl_in)
                xh = conv_b(xh, hcw=(conv_a.features, H, W),
                            interpret=interp)
                h_cur, w_cur, c_cur = H, W, conv_b.features
                continue
            if i == 0 and enc_route:
                x = self._conv_pair_hcw(conv_a, conv_b, x)
                continue
            sa, sb = self.feat_extracts[2 * i], self.feat_extracts[2 * i + 1]
            if xh is not None:
                # continue the HCW chain: stride-2 kernel + stride-1
                # kernel, exit to NHWC once per scale for the fusion
                dt = self.cfg.dtype
                h_out = h_cur // 2
                wp = xh.shape[2]
                wp2 = -(-wp // 256) * 256  # s2 kernel: input lanes %256
                ok = (
                    h_cur % 2 == 0 and (B2 * h_cur) % 16 == 0
                    and B2 * h_cur >= 32
                    and cp.hcw_channels_profitable(
                        [(c_cur, sa.features), (sa.features, sb.features)],
                        dt)
                    and cp.conv_s2_fits(wp2 // 2, c_cur, sa.features, dt)
                    and cp.conv_run_fits(
                        wp2 // 2, [(sa.features, sb.features)], dt)
                )
                if ok:
                    if wp2 != wp:
                        xh = jnp.pad(xh, ((0, 0), (0, 0), (0, wp2 - wp)))
                    xh = sa(xh, hcw=(c_cur, h_out, w_cur), interpret=interp)
                    h_cur = h_out
                    w_cur = (w_cur + 1) // 2
                    xh = sb(xh, hcw=(sa.features, h_cur, w_cur),
                            interpret=interp)
                    c_cur = sb.features
                    x = cp.hcw_to_nhwc(xh, B2, c_cur, w_cur)
                    feats.append(x)
                    continue
                # chain no longer feasible: exit and finish in XLA
                x = cp.hcw_to_nhwc(xh, B2, c_cur, w_cur)
                xh = None
            x = sa(x)
            x = sb(x)
            if i != 0:
                feats.append(x)
        return x, feats

    def shared_feat_enhancement(self, x):
        for blk in self.feat_enhance_transformer:
            x = blk(x)
        return x

    def estimate_local_motion(self, feat):
        """feat: [2B, h, w, C] fused tokens -> flows, occlusion, features."""
        B2 = feat.shape[0]
        B = B2 // 2
        motion_chunks = []
        for blk in self.local_motion_atmformer:
            feat, m = blk(feat)
            motion_chunks.append(jnp.concatenate([m[:B], m[B:]], axis=-1))
        feat_concat = jnp.concatenate([feat[:B], feat[B:]], axis=-1)
        motion = jnp.concatenate(motion_chunks, axis=-1)  # [B, h, w, 8]
        out = _seq(self.local_motion_mlp, jnp.concatenate([motion, feat_concat], -1))
        # flows/occlusion leave the head in f32: bf16 flow quantization
        # (rel. 2^-8) shifts warp taps by ~0.1px at typical magnitudes,
        # which measurably costs reconstruction quality
        out_f = out.astype(jnp.float32)
        flow0 = out_f[..., 0:2]
        flow1 = out_f[..., 2:4]
        occ1 = jax.nn.sigmoid(out_f[..., 4:5])
        return flow0, flow1, occ1, feat, out

    def estimate_global_motion(self, x, feat_scale_level):
        """x: coarsest encoder feat [2B, h8, w8, C]; returns 1/16-res flows."""
        feat_ = _seq(self.last_feat_extract, x)
        levels = [feat_scale_level[1], feat_scale_level[2], feat_]
        feat_ = self.global_feature_fusion(levels)
        return self._global_motion_from_tokens(feat_)

    def _global_motion_from_tokens(self, feat_):
        """Attention half of the global branch: fused 1/16 tokens ->
        flows. Split out so the spatial serving schedule can run the
        conv front (last_feat_extract + global fusion) per shard and
        only this part replicated (parallel/spatial.py deep cut)."""
        B = feat_.shape[0] // 2
        motion_chunks = []
        for blk in self.global_motion_atmformer:
            feat_, m = blk(feat_)
            motion_chunks.append(jnp.concatenate([m[:B], m[B:]], axis=-1))
        feat_ = jnp.concatenate([feat_[:B], feat_[B:]], axis=-1)
        motion = jnp.concatenate(motion_chunks, axis=-1)
        out = _seq(self.global_motion_mlp, jnp.concatenate([motion, feat_], -1))
        out_f = out.astype(jnp.float32)  # f32 flows (see estimate_local_motion)
        flow0 = out_f[..., 0:2]
        flow1 = out_f[..., 2:4]
        occ1 = jax.nn.sigmoid(out_f[..., 4:5])
        return flow0, flow1, occ1

    def _decoder_stage(self, stage, feat, want_hcw: bool = False):
        """One decoder stage [PReLU?, Deconv2x, ConvPReLU, PlainConv].

        Preferred route: HCW end to end — the Pallas deconv emits
        full-res HCW and the conv pair consumes it, so the stage pays
        ONE half-res entry transpose and one exit transpose. Widths
        that aren't 128-multiples are lane-padded at entry; the kernels
        mask reads/writes beyond the true width (exact — see
        conv3x3_hcw). Falls back to deconv-in-XLA + _conv_pair_hcw,
        then all-XLA.

        want_hcw=True (the planar full-res tail, scale 0): when the HCW
        route is taken, return `(xh, w_out_true)` WITHOUT the exit
        transpose — the refiner proj consumes the HCW activations and
        the motion channels are sliced planar. Callers must handle the
        NHWC fallback return.
        """
        from atmvfi_tpu.ops import conv_pallas as cp
        from atmvfi_tpu.ops import deconv_pallas as dp

        pre, deconv, conv_a, conv_b = stage[:-3], stage[-3], stage[-2], stage[-1]
        feat = _seq(pre, feat)
        B, h, w, cin = feat.shape
        wp = cp.lane_pad(w)
        out_shape = (B, 2 * h, 2 * w, deconv.features)
        use, interp = cp.resolve_conv_impl(self.cfg.conv_impl, out_shape)
        pair_ch = [(deconv.features, conv_a.features),
                   (conv_a.features, conv_b.features)]
        deconv_ok = (
            use and _hcw_route_on("dec") and (B * h) % 4 == 0
            # deconv cin is exempt from the channel gate: the deconv is
            # pure MXU matmul work at any width, unlike the halo convs
            and cp.hcw_channels_profitable(
                pair_ch, feat.dtype, wide=self.cfg.hcw_wide_channels)
            and dp.deconv_fits(wp, cin, deconv.features, feat.dtype)
            and cp.conv_run_fits(2 * wp, pair_ch, feat.dtype)
        )
        if deconv_ok:
            xh = cp.nhwc_to_hcw(feat)                 # half-res transpose
            xh = deconv(xh, hcw=(cin, w), interpret=interp)
            xh = self._run_pair_hcw(conv_a, conv_b, xh, deconv.features,
                                    2 * h, 2 * w, interp)
            if want_hcw:
                return xh, 2 * w
            return cp.hcw_to_nhwc(xh, B, conv_b.features, 2 * w)
        feat = deconv(feat)
        return self._conv_pair_hcw(conv_a, conv_b, feat)

    def _conv_pair_hcw(self, conv_a, conv_b, feat):
        """Run two stride-1 3x3 convs, through the Pallas HCW kernel when
        cfg.conv_impl resolves to it for this shape (full-res stages:
        XLA's conv layout copies cost more than the convs, PERF_NOTES).

        Casts to the convs' compute dtype FIRST so the entry transpose
        moves half the bytes and the channel padding granularity
        matches the kernel's (matters for the f32 image input of the
        encoder's first pair)."""
        from atmvfi_tpu.ops import conv_pallas as cp

        feat = feat.astype(conv_a.dtype)
        use, interp = cp.resolve_conv_impl(self.cfg.conv_impl, feat.shape)
        cin = feat.shape[-1]
        W = feat.shape[2]
        pair_ch = [(cin, conv_a.features), (conv_a.features, conv_b.features)]
        use = (
            use and _hcw_route_on("pair")
            and cp.hcw_channels_profitable(
                pair_ch, feat.dtype, wide=self.cfg.hcw_wide_channels)
            and cp.conv_run_fits(cp.lane_pad(W), pair_ch, feat.dtype)
        )
        if not use:
            return conv_b(conv_a(feat))
        B, H = feat.shape[0], feat.shape[1]
        xh = cp.nhwc_to_hcw(feat)
        xh = self._run_pair_hcw(conv_a, conv_b, xh, cin, H, W, interp)
        return cp.hcw_to_nhwc(xh, B, conv_b.features, W)

    def _run_pair_hcw(self, conv_a, conv_b, xh, cin, H, wt, interp):
        """conv_a -> conv_b on HCW activations [B*H, pad(cin), Wp]:
        ONE fused kernel (conv3x3_pair_hcw_op — the intermediate stays
        in VMEM, saving its HBM round trip) when the pair tiling fits
        VMEM, else the two kernels sequentially. Bit-exact either way
        (device-verified max|d|=0 at lite 1088x1920 / base 544x960,
        2026-08-20), but the fused form LOSES ~1.1-1.5% in-model
        (scripts/tpu_fusepair_ab.py: lite 4K 385.0 vs 380.7 ms, base
        1080p 151.7 vs 149.5) — the saved HBM round trip of the
        intermediate doesn't cover the 25% stage-A row recompute plus
        the lost cross-tile DMA overlap of two pipelined kernels (same
        mechanism as the fused dual-warp+blend negative, PERF_NOTES).
        Default is therefore sequential; cfg.hcw_fuse_pairs=True opts
        in, and ATMVFI_HCW_DISABLE=fuse still wins over it."""
        from atmvfi_tpu.ops import conv_pallas as cp

        fuse = (
            self.cfg.hcw_fuse_pairs
            and _hcw_route_on("fuse")
            and cp.pair_run_fits(xh.shape[2], cin, conv_a.features,
                                 conv_b.features, xh.dtype)
        )
        if fuse:
            ka, ba, sa = conv_a(None, hcw=(cin, H), params_only=True)
            kb, bb, sb = conv_b(None, hcw=(conv_a.features, H),
                                params_only=True)
            return cp.conv3x3_pair_hcw_op(
                xh, ka, ba, sa if sa is not None else jnp.zeros_like(ba),
                kb, bb, sb if sb is not None else jnp.zeros_like(bb),
                H, sa is not None, sb is not None, interp, wt,
            )
        xh = conv_a(xh, hcw=(cin, H, wt), interpret=interp)
        return conv_b(xh, hcw=(conv_a.features, H, wt), interpret=interp)

    def _planar_tail_on(self, H: int, W: int) -> bool:
        """Static gate for the planar full-res tail (cfg.tail_planar):
        decoder scale-0 feat stays HCW, images/blends stay in the warp
        kernel's planar [C, B*H, W] layout, and the refiner proj
        ingests image planes via DMA — no full-res NHWC<->HCW
        transposes anywhere between the pre-align warp and the refine
        head. 'auto' requires both the HCW conv route and the tiled
        warp kernel to be active for full-res shapes."""
        from atmvfi_tpu.ops import conv_pallas as cp
        from atmvfi_tpu.ops.warp_pallas import resolve_warp_impl

        mode = self.cfg.tail_planar
        if mode == "off" or not _hcw_route_on("tail"):
            return False
        kernel, _ = resolve_warp_impl(
            "tiled" if self.cfg.warp_impl == "auto" and mode == "on"
            else self.cfg.warp_impl, 3,
        )
        if kernel in ("xla", "nhwc"):
            return False
        if H % 8 or W % 128 or W < 384 or H < 64:
            return False
        use, _ = cp.resolve_conv_impl(self.cfg.conv_impl, (1, H, W, 16))
        return bool(use)

    def _planar_scale0(self, feat_hcw, w_out, B, p0, p1, im0, im1,
                       compose_flows, skips):
        """Scale-0 decoder tail in planar layout.

        feat_hcw: [B*H, pad(fd3+mo), Wp] from the decoder's HCW route;
        p0/p1: scale-0 images — planar [3, B*H, W] when the pre-align
        leg produced them, NHWC otherwise; im0/im1: the ORIGINAL frames
        (refiner inputs, reference network_base.py:530). Returns
        (I_t, I_t_0, I_t_1, flow0, flow1, occ1, residual) with I_t*,
        flow*, occ1 in NHWC for the output dict (lazy views — the
        serving jit that only consumes I_t DCEs the others)."""
        from atmvfi_tpu.ops.warp_pallas import (
            flow_warp_planar_pair_dispatch,
            nhwc_to_planar,
            planar_to_nhwc,
        )

        c = self.cfg
        mo = c.motion_out_dim
        fd3 = c.decoder_dims[2]
        BH, _, Wp = feat_hcw.shape
        H = BH // B
        m = feat_hcw[:, fd3 : fd3 + mo, :w_out].astype(jnp.float32)
        flow0 = jnp.stack([m[:, 0], m[:, 1]], -1).reshape(B, H, w_out, 2)
        flow1 = jnp.stack([m[:, 2], m[:, 3]], -1).reshape(B, H, w_out, 2)
        if compose_flows is not None:
            flow0 = flow0 + compose_flows[0]
            flow1 = flow1 + compose_flows[1]
        occ_pl = jax.nn.sigmoid(m[:, 4])  # [B*H, w]
        if p0.ndim != 3:
            p0 = nhwc_to_planar(p0)
            p1 = nhwc_to_planar(p1)
        w0p, w1p = flow_warp_planar_pair_dispatch(
            p0, p1, flow0, flow1, B, c.warp_impl
        )
        I_tp = occ_pl[None] * w0p + (1.0 - occ_pl[None]) * w1p

        planes15 = jnp.concatenate(
            [nhwc_to_planar(im0), w0p, nhwc_to_planar(im1), w1p, I_tp],
            axis=0,
        )
        if Wp != w_out:
            planes15 = jnp.pad(
                planes15, ((0, 0), (0, 0), (0, Wp - w_out))
            )
        residual = self.residual_refinement_planar(
            feat_hcw, fd3 + mo, w_out, B, planes15, skips
        )
        I_t = planar_to_nhwc(I_tp, B)
        I_t_0 = planar_to_nhwc(w0p, B)
        I_t_1 = planar_to_nhwc(w1p, B)
        occ1 = occ_pl.reshape(B, H, w_out, 1)
        return I_t, I_t_0, I_t_1, flow0, flow1, occ1, residual

    def residual_refinement(self, feat, im0, I_t_0, im1, I_t_1, I_t, skips):
        from atmvfi_tpu.ops import conv_pallas as cp
        from atmvfi_tpu.ops import deconv_pallas as dp

        dt = self.cfg.dtype
        cat0 = jnp.concatenate(
            [feat] + [t.astype(dt) for t in (im0, I_t_0, im1, I_t_1, I_t)],
            axis=-1,
        )
        use, interp = cp.resolve_conv_impl(self.cfg.conv_impl, cat0.shape)
        W = cat0.shape[2]
        proj_ch = [(cat0.shape[-1], self.refine_proj.features)]
        use = (
            use and _hcw_route_on("proj")
            and cp.hcw_channels_profitable(proj_ch, cat0.dtype)
            and cp.conv_run_fits(cp.lane_pad(W), proj_ch, cat0.dtype)
        )
        B, H = cat0.shape[0], cat0.shape[1]
        if use:
            xh = cp.nhwc_to_hcw(cat0)
            xh = self.refine_proj(xh, hcw=(cat0.shape[-1], H, W),
                                  interpret=interp)
            feat0 = cp.hcw_to_nhwc(xh, B, self.refine_proj.features, W)
        else:
            feat0 = self.refine_proj(cat0)
        return self._refine_core(feat0, skips)

    def residual_refinement_planar(self, feat_hcw, cf_true, w_true, B,
                                   planes15, skips):
        """Planar-tail refiner entry: feat arrives HCW straight from the
        decoder stage (no exit transpose) and the 15 image channels
        ([im0, I_t_0, im1, I_t_1, I_t] planes, [15, B*H, Wp] f32) DMA
        directly into the proj conv's slab (conv3x3_hcw_planes_op) —
        the reference's refiner input concat (network_base.py:417-431)
        without any full-res NHWC<->HCW transposes."""
        from atmvfi_tpu.ops import conv_pallas as cp

        dt = self.cfg.dtype
        BH, cfp, Wp = feat_hcw.shape
        H = BH // B
        cin_total = cf_true + planes15.shape[0]
        hid = self.refine_proj.features
        use, interp = cp.resolve_conv_impl(
            self.cfg.conv_impl, (B, H, w_true, cin_total)
        )
        use = (
            use and _hcw_route_on("proj")
            and cp.hcw_channels_profitable([(cin_total, hid)], dt)
            and cp.conv_run_fits(Wp, [(cin_total, hid)], dt)
        )
        if use:
            xh = self.refine_proj(
                feat_hcw, hcw=(cin_total, H, w_true), interpret=interp,
                planes=planes15, cf_true=cf_true,
            )
            feat0 = cp.hcw_to_nhwc(xh, B, hid, w_true)  # lazy view
            return self._refine_core(feat0, skips, feat0_hcw=xh,
                                     w0=w_true)
        else:
            # fall back to the NHWC concat path (pays the transposes)
            from atmvfi_tpu.ops.warp_pallas import planar_to_nhwc

            feat = cp.hcw_to_nhwc(feat_hcw, B, cf_true, w_true)
            imgs = [
                planar_to_nhwc(planes15[3 * i : 3 * i + 3, :, :w_true], B,
                               dtype=dt)
                for i in range(5)
            ]
            feat0 = self.refine_proj(
                jnp.concatenate([feat] + imgs, axis=-1)
            )
        return self._refine_core(feat0, skips)

    def _refine_core(self, feat0, skips, feat0_hcw=None, w0=None):
        """U-Net body. feat0_hcw (when the proj ran an HCW/planes
        kernel): the HCW proj output, consumed directly by a stride-2
        down1 kernel and by the head concat, making the full-res NHWC
        view `feat0` dead in the serving graph."""
        from atmvfi_tpu.ops import conv_pallas as cp
        from atmvfi_tpu.ops import deconv_pallas as dp

        dt = self.cfg.dtype
        B, H, W = feat0.shape[0], feat0.shape[1], feat0.shape[2]
        d1 = self.down1[0]
        use_d1 = False
        if feat0_hcw is not None and len(self.down1) == 1:
            hid_in = self.refine_proj.features
            wp0 = feat0_hcw.shape[2]
            wp2 = -(-wp0 // 256) * 256
            _, interp_d1 = cp.resolve_conv_impl(
                self.cfg.conv_impl, (B, H, W, hid_in)
            )
            use_d1 = (
                d1.stride == 2 and H % 2 == 0 and (B * H) % 16 == 0
                and B * H >= 32
                and cp.hcw_channels_profitable([(hid_in, d1.features)], dt)
                and cp.conv_s2_fits(wp2 // 2, hid_in, d1.features, dt)
            )
        if use_d1:
            xh0 = feat0_hcw
            if wp2 != wp0:
                xh0 = jnp.pad(xh0, ((0, 0), (0, 0), (0, wp2 - wp0)))
            xh1 = d1(xh0, hcw=(hid_in, H // 2, w0), interpret=interp_d1)
            w1 = (w0 + 1) // 2
            # lazy NHWC view — dead when only cat1 consumes it? no:
            # cat1 concatenates feat1, so this 1/2-res exit stays live
            feat1 = cp.hcw_to_nhwc(xh1, B, d1.features, w1)
            feat2 = self._refine_down2_hcw(xh1, w1, B, skips, interp_d1)
        else:
            feat1 = _seq(self.down1, feat0)
            feat2 = None
        if feat2 is None:
            feat2 = _seq(self.down2,
                         jnp.concatenate([feat1, skips[1]], axis=-1))
        feat3 = _seq(self.down3,
                     jnp.concatenate([feat2, skips[0]], axis=-1))
        feat2_ = _seq(self.up1, feat3)
        cat2 = jnp.concatenate([feat2_, feat2], axis=-1)

        # up2 (deconv 1/4 -> 1/2 + conv) in HCW: its XLA conv measured
        # 11.7 ms standalone at lite-4K's 64->32 @ 1088x1920 vs 2.4 ms
        # for the kernel WITH transposes (scripts/tpu_conv_shapes_ab
        # h1, v5e 2026-08-19) — narrow channels at a terrible
        # T(2,128) layout. When down1 also ran HCW the skip concat
        # happens in-layout and the whole up2 -> cat1 -> up3 -> head
        # chain has no full-res-adjacent NHWC round trip.
        u2d, u2c = self.up2[0], self.up2[1]
        H2, W2 = cat2.shape[1], cat2.shape[2]
        H1, W1 = feat1.shape[1], feat1.shape[2]
        gran = 16 if jnp.dtype(dt).itemsize == 2 else 8
        use2, interp2 = cp.resolve_conv_impl(
            self.cfg.conv_impl, (B, H1, W1, u2d.features)
        )
        wq = cp.lane_pad(W2)
        up2_route = (
            use2 and _hcw_route_on("up2")
            and 2 * H2 == H1 and 2 * W2 == W1
            and (B * H2) % 4 == 0 and (B * H1) % 8 == 0
            and cp.channel_pad(u2c.features, dt) == u2c.features
            and dp.deconv_fits(wq, cat2.shape[-1], u2d.features, dt)
            and cp.conv_run_fits(2 * wq, [(u2d.features, u2c.features)], dt)
            and cp.hcw_channels_profitable(
                [(u2d.features, u2c.features)], dt)
        )
        cat1 = None
        cat1_hcw = None
        xh2 = None
        if up2_route:
            xcat2 = cp.nhwc_to_hcw(cat2.astype(dt), wq)
            xh2 = u2d(xcat2, hcw=(cat2.shape[-1], W2), interpret=interp2)
            xh2 = u2c(xh2, hcw=(u2d.features, H1, W1), interpret=interp2)
            if use_d1 and cp.channel_pad(d1.features, dt) == d1.features:
                # skip concat in HCW layout (both operands pad-free in
                # channels; widths aligned to the wider lane pad)
                xh1c = xh1
                if xh1c.shape[2] < xh2.shape[2]:
                    xh1c = jnp.pad(
                        xh1c,
                        ((0, 0), (0, 0), (0, xh2.shape[2] - xh1c.shape[2])),
                    )
                cat1_hcw = jnp.concatenate([xh2, xh1c], axis=1)
            else:
                cat1 = jnp.concatenate(
                    [cp.hcw_to_nhwc(xh2, B, u2c.features, W1), feat1],
                    axis=-1,
                )
        else:
            feat1_ = _seq(self.up2, cat2)
            cat1 = jnp.concatenate([feat1_, feat1], axis=-1)

        hid = self.up3[0].features
        head_ch = [(2 * hid, self.refine_head[0].features),
                   (self.refine_head[0].features, self.refine_head[1].features)]
        use_head, interp = cp.resolve_conv_impl(
            self.cfg.conv_impl, (B, H, W, 2 * hid)
        )
        use_head = use_head and cp.hcw_channels_profitable(head_ch, dt)
        Wh = W1
        cat1_ch = u2c.features + d1.features
        # the chain carries the 1/2-res lane pad through the up3
        # deconv; 2*lane_pad(W/4) can exceed lane_pad(W/2) (e.g. 2048
        # vs 1920 at 4K), so the head then runs slightly wider
        wph = cat1_hcw.shape[2] if cat1_hcw is not None else cp.lane_pad(Wh)
        # preferred: up3's deconv emits full-res HCW straight into the
        # head pair — the channel concat with feat0 happens in HCW
        # (contiguous true channels when hid is a sublane-tile multiple)
        # and the full-res XLA conv_transpose + its PReLU pass vanish
        deconv_route = (
            use_head and _hcw_route_on("up3") and hid % gran == 0
            and (B * H1) % 4 == 0
            and dp.deconv_fits(wph, cat1_ch, hid, dt)
            and cp.conv_run_fits(2 * wph, head_ch, dt)
        )
        if not deconv_route and cat1 is None:
            # up2 ran HCW but the up3 deconv route refused: exit here
            cat1 = jnp.concatenate(
                [cp.hcw_to_nhwc(xh2, B, u2c.features, W1), feat1],
                axis=-1,
            )
        if deconv_route:
            xcat = (cat1_hcw if cat1_hcw is not None
                    else cp.nhwc_to_hcw(cat1.astype(dt), wph))
            xh0_ = self.up3[0](xcat, hcw=(cat1_ch, Wh),
                               interpret=interp)
            w_full = xh0_.shape[2]  # 2 * the half-res lane pad used
            if feat0_hcw is not None:
                f0h = feat0_hcw
                if f0h.shape[2] != w_full:
                    f0h = jnp.pad(
                        f0h, ((0, 0), (0, 0), (0, w_full - f0h.shape[2]))
                    )
            else:
                f0h = cp.nhwc_to_hcw(feat0.astype(dt), w_full)
            xh = jnp.concatenate([xh0_, f0h], axis=1)
            xh = self._run_pair_hcw(self.refine_head[0],
                                    self.refine_head[1], xh, 2 * hid,
                                    H, W, interp)
            return 2 * jax.nn.sigmoid(
                cp.hcw_to_nhwc(xh, B, self.refine_head[1].features, W)
            ) - 1

        feat0_ = _seq(self.up3, cat1)
        cat_h = jnp.concatenate([feat0_, feat0], axis=-1)
        use_head = (
            use_head and _hcw_route_on("head")
            and cp.conv_run_fits(cp.lane_pad(W), head_ch, cat_h.dtype)
        )
        if use_head:
            xh = cp.nhwc_to_hcw(cat_h)
            xh = self._run_pair_hcw(self.refine_head[0],
                                    self.refine_head[1], xh,
                                    cat_h.shape[-1], H, W, interp)
            res = cp.hcw_to_nhwc(xh, B, self.refine_head[1].features, W)
        else:
            res = _seq(self.refine_head, cat_h)
        return 2 * jax.nn.sigmoid(res) - 1

    def _refine_down2_hcw(self, xh1, w1, B, skips, interp):
        """down2 of the refiner U-Net in HCW (stride-2 + stride-1
        kernels; the 1/2-res skip transposes in and the channel concat
        happens at a padded boundary that lines up with
        pack_conv3x3_weights_padded's zero rows). Exits ONCE at 1/4
        resolution. down3/up1/up2 deliberately stay XLA: their channel
        widths (e.g. lite 288->128 at 1/4) are where lax.conv is
        MXU-efficient and the HCW kernel's edge inverts (~229ch
        measured, PERF_NOTES). Returns feat2 NHWC or None."""
        from atmvfi_tpu.ops import conv_pallas as cp

        dt = self.cfg.dtype
        gran = 16 if jnp.dtype(dt).itemsize == 2 else 8
        hid = self.down1[0].features
        if len(self.down2) != 2:
            return None
        d2a, d2b = self.down2
        if d2a.stride != 2 or d2b.stride != 1:
            return None
        BH1 = xh1.shape[0]
        h1 = BH1 // B
        cin2 = hid + skips[1].shape[-1]
        w2 = w1 // 2
        wp1 = xh1.shape[2]
        wp1b = -(-wp1 // 256) * 256
        wq2 = wp1b // 2
        ok = (
            hid % gran == 0
            and w1 % 2 == 0 and h1 % 2 == 0
            and (B * h1) % 16 == 0 and B * h1 >= 32
            and cp.hcw_channels_profitable(
                [(cin2, d2a.features), (d2a.features, d2b.features)], dt)
            and cp.conv_s2_fits(wq2, cin2, d2a.features, dt)
            and cp.conv_run_fits(wq2, [(d2a.features, d2b.features)], dt)
        )
        if not ok:
            return None
        x = xh1
        if wp1b != wp1:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, wp1b - wp1)))
        x = jnp.concatenate(
            [x, cp.nhwc_to_hcw(skips[1].astype(dt), wp1b)], axis=1
        )
        x = d2a(x, hcw=(cin2, h1 // 2, w1), interpret=interp)
        x = d2b(x, hcw=(d2a.features, h1 // 2, w2), interpret=interp)
        return cp.hcw_to_nhwc(x, B, d2b.features, w2)

    # ------------------------------------------------------------------
    # global-motion multiscale ensemble (vectorized; network_base.py:548-605)
    # ------------------------------------------------------------------
    def _global_alignmentness(self, flow0, flow1, im0, im1):
        H0 = im0.shape[1]
        factor = H0 // flow0.shape[1]
        f0 = ops.upsample_flow(flow0, factor)
        f1 = ops.upsample_flow(flow1, factor)
        w0, w1 = self._warp_pair(im0, im1, f0, f1)
        return jnp.mean(jnp.abs(w0 - w1), axis=(1, 2, 3))  # [B]

    def multiscale_global_motion_ensemble(self, im0, im1):
        im = jnp.concatenate([im0, im1], axis=0)
        f0s, f1s, losses = [], [], []
        for level in range(3):
            if level > 0:
                im = ops.downsample_2x(im)
            x, levels = self.shared_feat_extraction(im.astype(self.cfg.dtype))
            f0, f1, _ = self.estimate_global_motion(x, levels)
            losses.append(self._global_alignmentness(f0, f1, im0, im1))
            if level > 0:
                f0 = ops.upsample_flow(f0, 2**level)
                f1 = ops.upsample_flow(f1, 2**level)
            f0s.append(f0)
            f1s.append(f1)
        loss = jnp.stack(losses, axis=0)  # [3, B]
        best = jnp.argmin(loss, axis=0)  # [B]
        sel = best[None, :, None, None, None]  # broadcast over [3,B,h,w,2]
        f0 = jnp.take_along_axis(jnp.stack(f0s, 0), sel, axis=0)[0]
        f1 = jnp.take_along_axis(jnp.stack(f1s, 0), sel, axis=0)[0]
        return f0, f1

    # ------------------------------------------------------------------
    # spatially-sharded serving split (parallel/spatial.py)
    #
    # The forward is cut at the scale-0 decoder stage: everything at
    # <= 1/2 resolution (encoder, fusion, attention, global/local
    # motion, decoder stages 2 and 1) is the HEAD — cheap enough to
    # compute replicated per shard on the full frames — and the
    # full-resolution TAIL (scale-0 decoder stage, pre-align + blend
    # warps, refiner U-Net) runs per shard on a slab of
    # local-rows + margin. Convs erode the slab edges by their
    # receptive field (cropped away); warps read FULL all-gathered
    # sources via the source-offset ops, so any flow magnitude stays
    # exact. Serving-only (B == 1, no training outputs).
    # ------------------------------------------------------------------
    # ---- deep three-way split (round-5): sharded conv front ----------
    # front (SHARDED): pyramid encoder + both cross-scale fusions on a
    #   full-res row slab — the full-res conv work that dominated the
    #   old replicated head. Slab start must be ≡ 0 (mod 16) so every
    #   strided conv (stride 2/4 legs, 1/16 extract) lands on the
    #   global stride grid; corrupted slab-edge rows are cropped by the
    #   caller before the token all-gathers.
    # middle (REPLICATED): everything attention — global/local
    #   ATMFormers, motion MLPs, enhancement, the unbounded token/
    #   feature warps — on the gathered 1/8 + 1/16 token maps. This is
    #   the Amdahl floor of the schedule (PERF_NOTES round 5).
    # tail (SHARDED): all three decoder stages + blends + refiner on a
    #   slab of the replicated decoder input (serving_tail_deep).
    # ------------------------------------------------------------------
    def serving_front(self, im0_slab, im1_slab, global_motion: bool = True):
        """Sharded front: frame slab [1, Hs, W, 3] x2 ->
        (fused 1/8 tokens [2, Hs/8, W/8, fused_dim],
         global 1/16 tokens [2, Hs/16, W/16, global_dim] | None)."""
        c = self.cfg
        im0_slab = im0_slab.astype(jnp.float32)
        im1_slab = im1_slab.astype(jnp.float32)
        img_planes = None
        if self._planar_tail_on(im0_slab.shape[1], im0_slab.shape[2]):
            from atmvfi_tpu.ops.warp_pallas import nhwc_to_planar

            img_planes = jnp.concatenate(
                [nhwc_to_planar(im0_slab), nhwc_to_planar(im1_slab)],
                axis=1,
            )
        x, fsl = self.shared_feat_extraction(
            jnp.concatenate([im0_slab, im1_slab], axis=0).astype(c.dtype),
            img_planes,
        )
        feat = self.cross_scale_feature_fusion(fsl)
        gtok = None
        if global_motion:
            feat_ = _seq(self.last_feat_extract, x)
            gtok = self.global_feature_fusion([fsl[1], fsl[2], feat_])
        return feat, gtok

    def serving_middle(self, feat, gtok, global_motion: bool = True):
        """Replicated middle: gathered token maps -> decoder input.

        feat: [2B, H/8, W/8, fused_dim]; gtok: [2B, H/16, W/16,
        global_dim] (None when global_motion off). Returns
        (dec_in [B, H/8, W/8, 2*fused+5], gf0_full, gf1_full) with the
        full-res global flows replicated (the align_corners resize is
        not slab-local, and at 2 channels the replicated upsample is
        cheap); the tail slices its slab rows from them. Composed from
        the three parts below so the sharded-middle schedule and this
        replicated form share one definition."""
        feat, gf0_full, gf1_full = self.serving_middle_global(
            feat, gtok, global_motion
        )
        enh, out = self.serving_middle_attn(feat)
        return self.serving_middle_decin(enh, out), gf0_full, gf1_full

    # -- sharded-middle refinement (round-5b): the attention stack of
    # the middle is itself slab-shardable at 1/8 when slab bounds land
    # on the global 8-row window grid: windows are independent except
    # at shifted boundaries, and a shifted block's wrap-around (its
    # slab-local roll + edge-window mask) only corrupts the outermost
    # window rows, which a >= 32-row halo absorbs. Only the global
    # branch, the token pre-align warp, and the decoder-input feature
    # warps (unbounded reads -> full maps) stay replicated.
    # ------------------------------------------------------------------
    def serving_middle_global(self, feat, gtok, global_motion: bool = True):
        """Replicated middle part A: global flows + token pre-align.

        Returns (feat_aligned [2B, H/8, W/8, C], gf0_full, gf1_full)."""
        c = self.cfg
        B = feat.shape[0] // 2
        gf0_full = gf1_full = None
        if global_motion:
            gf0, gf1, _ = self._global_motion_from_tokens(gtok)
            gf0 = ops.upsample_flow(gf0, 2)
            gf1 = ops.upsample_flow(gf1, 2)
            feat = jnp.concatenate(
                [self._warp(feat[:B], gf0), self._warp(feat[B:], gf1)],
                axis=0,
            )
            for _ in range(c.pyramid_level - 1):
                gf0 = ops.upsample_flow(gf0, 2)
                gf1 = ops.upsample_flow(gf1, 2)
            gf0_full, gf1_full = gf0, gf1
        return feat, gf0_full, gf1_full

    def serving_middle_flows(self, gtok):
        """Replicated flow head of the middle: global 1/16 tokens ->
        (gf8_0, gf8_1 [1/8-res flows], gf0_full, gf1_full). The token
        pre-align and decoder-input warps themselves are computed per
        shard from these (serving_middle_align_rows / _decin_rows) —
        warp OUTPUTS are row-local even though their reads are not."""
        c = self.cfg
        gf0, gf1, _ = self._global_motion_from_tokens(gtok)
        gf0 = ops.upsample_flow(gf0, 2)
        gf1 = ops.upsample_flow(gf1, 2)
        g0, g1 = gf0, gf1
        for _ in range(c.pyramid_level - 1):
            g0 = ops.upsample_flow(g0, 2)
            g1 = ops.upsample_flow(g1, 2)
        return gf0, gf1, g0, g1

    def serving_middle_align_rows(self, feat, gf8_0_rows, gf8_1_rows,
                                  row0):
        """Sharded token pre-align: full fused tokens [2B, H/8, W/8, C]
        + the global 1/8 flows at output rows [row0, row0+rows) ->
        aligned tokens on those rows (row-for-row equal to the
        replicated warp; ops.flow_warp_rows)."""
        B = feat.shape[0] // 2
        return jnp.concatenate(
            [
                ops.flow_warp_rows(feat[:B], gf8_0_rows, row0),
                ops.flow_warp_rows(feat[B:], gf8_1_rows, row0),
            ],
            axis=0,
        )

    def serving_middle_decin_rows(self, enh, out_rows, row0):
        """Sharded decoder-input assembly: full enhanced features (warp
        sources) + the motion head output at rows [row0, row0+rows) ->
        dec_in on those rows."""
        fd1 = self.cfg.decoder_dims[0]
        out_f = out_rows.astype(jnp.float32)
        flow0 = out_f[..., 0:2]
        flow1 = out_f[..., 2:4]
        return jnp.concatenate(
            [
                ops.flow_warp_rows(enh[..., :fd1], flow0, row0),
                ops.flow_warp_rows(enh[..., fd1 : 2 * fd1], flow1, row0),
                out_rows,
            ],
            axis=-1,
        )

    def serving_middle_attn(self, feat_slab):
        """Sharded middle part B: pre-aligned token slab (8-row-aligned
        at 1/8 so the window grid matches the global partition) ->
        (enhanced 2C features, local-motion 5ch head output) on the
        slab rows."""
        B = feat_slab.shape[0] // 2
        _, _, _, feat, out = self.estimate_local_motion(feat_slab)
        feat = self.shared_feat_enhancement(feat)
        feat = jnp.concatenate([feat[:B], feat[B:]], axis=-1)
        return feat, out

    def serving_middle_decin(self, enh, out):
        """Replicated middle part C: decoder-input assembly from the
        gathered enhanced features + motion head output (the flows are
        re-derived from `out` exactly as estimate_local_motion does)."""
        fd1 = self.cfg.decoder_dims[0]
        out_f = out.astype(jnp.float32)
        flow0 = out_f[..., 0:2]
        flow1 = out_f[..., 2:4]
        return jnp.concatenate(
            [
                self._warp(enh[..., :fd1], flow0),
                self._warp(enh[..., fd1 : 2 * fd1], flow1),
                out,
            ],
            axis=-1,
        )

    def serving_tail_deep(self, dec_in_slab, im0_pl, im1_pl, gf0_slab,
                          gf1_slab, slab_row0, crop_off: int,
                          h_loc: int, axis_name: str,
                          global_motion: bool = True):
        """Sharded deep tail: decoder-input slab -> the shard's I_t rows.

        dec_in_slab: [1, Hs/8, W/8, 2*fused+5] slice of serving_middle's
        replicated output; gf*_slab: [1, Hs, W, 2] full-res global-flow
        slab rows (None when global_motion off); other args as
        serving_tail. Runs decoder stages 2 and 1 on the slab (the old
        replicated-head work), then the existing scale-0 tail."""
        feat = dec_in_slab
        skips = []
        mo = self.cfg.motion_out_dim
        for stage in (self.upsample0, self.upsample1):
            feat = self._decoder_stage(stage, feat)
            skips.append(feat[..., :-mo])
        return self.serving_tail(
            feat, skips, im0_pl, im1_pl, gf0_slab, gf1_slab, slab_row0,
            crop_off, h_loc, axis_name, global_motion=global_motion,
        )

    def serving_head(self, im0, im1, global_motion: bool = True,
                     ensemble_global_motion: bool = False):
        """Replicated head: full frames -> tail inputs.

        Returns (feat, skips, gf0_full, gf1_full): feat is the scale-1
        decoder output at 1/2 res (fd2+mo channels), skips the refiner
        skip features [1/4, 1/2], gf*_full the full-res upsampled
        global flows (None when global_motion=False). Mirrors
        __call__'s orchestration (same module call ORDER, so the param
        tree binds identically) minus the scale-0 tail and the
        training-only warped-pyramid outputs."""
        c = self.cfg
        im0 = im0.astype(jnp.float32)
        im1 = im1.astype(jnp.float32)
        B = im0.shape[0]
        im0_list: List[jnp.ndarray] = [im0]
        im1_list: List[jnp.ndarray] = [im1]
        for _ in range(c.pyramid_level - 1):
            im0_list.append(ops.downsample_2x(im0_list[-1]))
            im1_list.append(ops.downsample_2x(im1_list[-1]))
        img_planes = None
        if self._planar_tail_on(im0.shape[1], im0.shape[2]):
            # mirror __call__: feed the planes-DMA encoder route so the
            # replicated head doesn't run the slower encoder path
            from atmvfi_tpu.ops.warp_pallas import nhwc_to_planar

            img_planes = jnp.concatenate(
                [nhwc_to_planar(im0), nhwc_to_planar(im1)], axis=1
            )
        x, feat_scale_level = self.shared_feat_extraction(
            jnp.concatenate([im0, im1], axis=0).astype(c.dtype),
            img_planes,
        )
        feat = self.cross_scale_feature_fusion(feat_scale_level)

        gf0_full = gf1_full = None
        if global_motion:
            if ensemble_global_motion:
                # SNU/Xiph ensemble protocol on the mesh path (round-5
                # VERDICT item 6): the multiscale ensemble is <= 1/2-res
                # work plus full-res alignmentness warps, run replicated
                # here on the gathered frames (network_base.py:564-605)
                gf0, gf1 = self.multiscale_global_motion_ensemble(im0, im1)
            else:
                gf0, gf1, _ = self.estimate_global_motion(
                    x, feat_scale_level
                )
            gf0 = ops.upsample_flow(gf0, 2)
            gf1 = ops.upsample_flow(gf1, 2)
            feat = jnp.concatenate(
                [self._warp(feat[:B], gf0), self._warp(feat[B:], gf1)],
                axis=0,
            )
            for i in reversed(range(c.pyramid_level)):
                if i == 0:
                    gf0_full, gf1_full = gf0, gf1
                    continue
                im0_list[i], im1_list[i] = self._warp_pair(
                    im0_list[i], im1_list[i], gf0, gf1
                )
                gf0 = ops.upsample_flow(gf0, 2)
                gf1 = ops.upsample_flow(gf1, 2)

        flow0, flow1, occ1, feat, out = self.estimate_local_motion(feat)
        feat = self.shared_feat_enhancement(feat)
        feat = jnp.concatenate([feat[:B], feat[B:]], axis=-1)
        fd1 = c.decoder_dims[0]
        feat = jnp.concatenate(
            [
                self._warp(feat[..., :fd1], flow0),
                self._warp(feat[..., fd1 : 2 * fd1], flow1),
                out,
            ],
            axis=-1,
        )
        skips = []
        mo = c.motion_out_dim
        for stage in (self.upsample0, self.upsample1):
            feat = self._decoder_stage(stage, feat)
            skips.append(feat[..., :-mo])
        return feat, skips, gf0_full, gf1_full

    def serving_tail(self, feat_slab, skips_slab, im0_pl, im1_pl,
                     gf0_slab, gf1_slab, slab_row0, crop_off: int,
                     h_loc: int, axis_name: str,
                     global_motion: bool = True):
        """Sharded tail: one slab of rows -> the shard's I_t rows.

        feat_slab: [1, Hs/2, W/2, fd2+mo] slice of the head's scale-1
        output; skips_slab: [1/4, 1/2]-res slices; im0_pl/im1_pl:
        FULL-frame planar [3, H, W] f32 sources; gf*_slab: full-res
        global flows for the slab rows (None when global_motion off);
        slab_row0: traced int32 global row of slab row 0; crop_off:
        traced row offset of the shard's true rows inside the slab;
        axis_name: the shard_map spatial axis (for the pre-aligned
        source all-gather). Returns I_t [1, h_loc, W, 3] f32."""
        from atmvfi_tpu.ops.warp_pallas import (
            planar_warp_pair_srcfull,
            planar_to_nhwc,
        )

        c = self.cfg
        mo = c.motion_out_dim
        fd3 = c.decoder_dims[2]
        W = im0_pl.shape[2]
        compose = global_motion and c.compose_full_res_warps

        # scale-0 pre-align on the slab (full sources, exact for any
        # global flow); compose mode leaves the images unwarped
        if global_motion and not compose:
            p0, p1 = planar_warp_pair_srcfull(
                im0_pl, im1_pl, gf0_slab, gf1_slab, slab_row0,
                impl=c.warp_impl,
            )
        else:
            hs = gf0_slab.shape[1] if gf0_slab is not None \
                else 2 * feat_slab.shape[1]
            p0 = jax.lax.dynamic_slice_in_dim(im0_pl, slab_row0, hs, 1)
            p1 = jax.lax.dynamic_slice_in_dim(im1_pl, slab_row0, hs, 1)

        # blend-warp sources must be the PRE-ALIGNED full images: crop
        # each shard's true rows and all-gather (the decoder's local
        # flows are unbounded, so a halo cannot carry this exactly).
        # axis_name=None (single-chip slab simulation, used by the
        # device timing script): skip the gather and warp within the
        # slab — same compute, sources clamped at slab edges.
        if axis_name is None:
            p0_full, p1_full = p0, p1
            blend_row0 = jnp.zeros((), jnp.int32)
        else:
            p0_loc = jax.lax.dynamic_slice_in_dim(p0, crop_off, h_loc, 1)
            p1_loc = jax.lax.dynamic_slice_in_dim(p1, crop_off, h_loc, 1)
            p0_full = jax.lax.all_gather(p0_loc, axis_name, axis=1,
                                         tiled=True)
            p1_full = jax.lax.all_gather(p1_loc, axis_name, axis=1,
                                         tiled=True)
            blend_row0 = slab_row0

        # want_hcw respects the same route-control surface as the
        # monolithic forward (cfg.tail_planar / ATMVFI_HCW_DISABLE=tail),
        # evaluated at the slab's full-res dims
        Hs_full = 2 * feat_slab.shape[1]
        res = self._decoder_stage(
            self.upsample2, feat_slab,
            want_hcw=self._planar_tail_on(Hs_full, W),
        )
        if not isinstance(res, tuple):
            # HCW route refused this slab shape: NHWC fallback tail
            return self._serving_tail_nhwc(
                res, skips_slab, p0_full, p1_full, im0_pl, im1_pl,
                gf0_slab, gf1_slab, slab_row0, blend_row0, crop_off,
                h_loc, compose,
            )
        feat_hcw, w_out = res
        BH_s, _, Wp = feat_hcw.shape
        Hs = BH_s  # B == 1
        m = feat_hcw[:, fd3 : fd3 + mo, :w_out].astype(jnp.float32)
        flow0 = jnp.stack([m[:, 0], m[:, 1]], -1).reshape(1, Hs, w_out, 2)
        flow1 = jnp.stack([m[:, 2], m[:, 3]], -1).reshape(1, Hs, w_out, 2)
        if compose:
            flow0 = flow0 + gf0_slab
            flow1 = flow1 + gf1_slab
        occ_pl = jax.nn.sigmoid(m[:, 4])  # [Hs, w]
        w0p, w1p = planar_warp_pair_srcfull(
            p0_full, p1_full, flow0, flow1, blend_row0, impl=c.warp_impl
        )
        I_tp = occ_pl[None] * w0p + (1.0 - occ_pl[None]) * w1p

        im0_slab = jax.lax.dynamic_slice_in_dim(im0_pl, slab_row0, Hs, 1)
        im1_slab = jax.lax.dynamic_slice_in_dim(im1_pl, slab_row0, Hs, 1)
        planes15 = jnp.concatenate(
            [im0_slab, w0p, im1_slab, w1p, I_tp], axis=0
        )
        if Wp != w_out:
            planes15 = jnp.pad(planes15, ((0, 0), (0, 0), (0, Wp - w_out)))
        residual = self.residual_refinement_planar(
            feat_hcw, fd3 + mo, w_out, 1, planes15, skips_slab
        )
        I_t = planar_to_nhwc(I_tp, 1)
        I_t = jnp.clip(I_t + residual.astype(jnp.float32), 0.0, 1.0)
        return jax.lax.dynamic_slice_in_dim(I_t, crop_off, h_loc, 1)

    def _serving_tail_nhwc(self, feat, skips_slab, p0_full, p1_full,
                           im0_pl, im1_pl, gf0_slab, gf1_slab,
                           slab_row0, blend_row0, crop_off, h_loc,
                           compose):
        """NHWC fallback tail (slab shapes the HCW route refused):
        decoder stage already ran; warps sample the full pre-aligned
        sources via the source-offset XLA path."""
        from atmvfi_tpu.ops.warp_pallas import (
            _srcfull_xla,
            planar_to_nhwc,
        )

        c = self.cfg
        mo = c.motion_out_dim
        out_f = feat[..., -mo:].astype(jnp.float32)
        flow0 = out_f[..., 0:2]
        flow1 = out_f[..., 2:4]
        if compose:
            flow0 = flow0 + gf0_slab
            flow1 = flow1 + gf1_slab
        occ1 = jax.nn.sigmoid(out_f[..., 4:5])
        off = jnp.zeros((1, 1, 2), jnp.float32).at[0, 0, 1].set(
            1.0
        ) * blend_row0.astype(jnp.float32)
        w0 = planar_to_nhwc(_srcfull_xla(p0_full, flow0[0] + off), 1)
        w1 = planar_to_nhwc(_srcfull_xla(p1_full, flow1[0] + off), 1)
        I_t = occ1 * w0 + (1.0 - occ1) * w1
        Hs = feat.shape[1]
        im0_s = planar_to_nhwc(
            jax.lax.dynamic_slice_in_dim(im0_pl, slab_row0, Hs, 1), 1
        )
        im1_s = planar_to_nhwc(
            jax.lax.dynamic_slice_in_dim(im1_pl, slab_row0, Hs, 1), 1
        )
        residual = self.residual_refinement(
            feat, im0_s, w0, im1_s, w1, I_t, skips_slab
        )
        I_t = jnp.clip(I_t + residual.astype(jnp.float32), 0.0, 1.0)
        return jax.lax.dynamic_slice_in_dim(I_t, crop_off, h_loc, 1)

    # ------------------------------------------------------------------
    # main forward
    # ------------------------------------------------------------------
    def __call__(self, im0, im1, global_motion: bool = True,
                 ensemble_global_motion: bool = False):
        c = self.cfg
        # mixed-precision policy: the image pyramid, flows, occlusions
        # and warped blends stay f32 (quality-critical, cheap); only
        # the conv/attention towers run in cfg.dtype (bf16 on TPU)
        im0 = im0.astype(jnp.float32)
        im1 = im1.astype(jnp.float32)
        B = im0.shape[0]
        planar_tail = self._planar_tail_on(im0.shape[1], im0.shape[2])

        im0_list: List[jnp.ndarray] = [im0]
        im1_list: List[jnp.ndarray] = [im1]
        im_t_list: List[jnp.ndarray] = []
        im0_warped_list: List[jnp.ndarray] = []
        im1_warped_list: List[jnp.ndarray] = []
        for _ in range(c.pyramid_level - 1):
            im0_list.append(ops.downsample_2x(im0_list[-1]))
            im1_list.append(ops.downsample_2x(im1_list[-1]))

        img_planes = None
        if planar_tail:
            from atmvfi_tpu.ops.warp_pallas import nhwc_to_planar

            # [3, 2B*H, W]: the per-image planar views are shared (CSE)
            # with the planar tail's warp inputs and refiner planes
            img_planes = jnp.concatenate(
                [nhwc_to_planar(im0), nhwc_to_planar(im1)], axis=1
            )
        x, feat_scale_level = self.shared_feat_extraction(
            jnp.concatenate([im0, im1], axis=0).astype(c.dtype),
            img_planes,
        )
        feat = self.cross_scale_feature_fusion(feat_scale_level)  # [2B,h,w,C]

        if global_motion:
            if ensemble_global_motion:
                gf0, gf1 = self.multiscale_global_motion_ensemble(im0, im1)
            else:
                gf0, gf1, gocc1 = self.estimate_global_motion(x, feat_scale_level)
                im0_d16 = ops.downsample_2x(im0_list[-1])
                im1_d16 = ops.downsample_2x(im1_list[-1])
                I_t, I_t_0, I_t_1 = self._warp_blend(
                    im0_d16, im1_d16, gf0, gf1, gocc1
                )
                im0_warped_list.insert(0, I_t_0)
                im1_warped_list.insert(0, I_t_1)
                im_t_list.insert(0, I_t)

            gf0 = ops.upsample_flow(gf0, 2)
            gf1 = ops.upsample_flow(gf1, 2)
            # pre-align the fused tokens and the whole image pyramid
            feat = jnp.concatenate(
                [self._warp(feat[:B], gf0), self._warp(feat[B:], gf1)], axis=0
            )
            for i in reversed(range(c.pyramid_level)):
                if i == 0 and c.compose_full_res_warps:
                    # fast mode: leave the full-res images unwarped and
                    # fold the (smooth, 16x-upsampled) global flow into
                    # the decoder's final flows — one resampling instead
                    # of two (exact composition would read the global
                    # flow at the locally-displaced position)
                    gf0_full, gf1_full = gf0, gf1
                    continue
                if i == 0 and planar_tail:
                    # planar tail: the full-res pre-align warp emits the
                    # kernel's native [C, B*H, W] layout; the scale-0
                    # blend warps consume it with no transposes between
                    from atmvfi_tpu.ops.warp_pallas import (
                        flow_warp_planar_pair_dispatch,
                        nhwc_to_planar,
                    )

                    im0_list[0], im1_list[0] = \
                        flow_warp_planar_pair_dispatch(
                            nhwc_to_planar(im0_list[0]),
                            nhwc_to_planar(im1_list[0]),
                            gf0, gf1, B, c.warp_impl,
                        )
                    continue
                im0_list[i], im1_list[i] = self._warp_pair(
                    im0_list[i], im1_list[i], gf0, gf1
                )
                if i != 0:
                    gf0 = ops.upsample_flow(gf0, 2)
                    gf1 = ops.upsample_flow(gf1, 2)
        compose_full = global_motion and c.compose_full_res_warps

        flow0, flow1, occ1, feat, out = self.estimate_local_motion(feat)

        feat = self.shared_feat_enhancement(feat)
        feat = jnp.concatenate([feat[:B], feat[B:]], axis=-1)  # [B,h,w,2C]

        I_t, I_t_0, I_t_1 = self._warp_blend(
            im0_list[-1], im1_list[-1], flow0, flow1, occ1
        )
        im0_warped_list.insert(0, I_t_0)
        im1_warped_list.insert(0, I_t_1)
        im_t_list.insert(0, I_t)

        fd1, fd2, fd3 = c.decoder_dims
        feat = jnp.concatenate(
            [
                self._warp(feat[..., :fd1], flow0),
                self._warp(feat[..., fd1 : 2 * fd1], flow1),
                out,
            ],
            axis=-1,
        )

        skips = []
        mo = c.motion_out_dim
        planar_done = False
        for stage, scale in zip(
            (self.upsample0, self.upsample1, self.upsample2), (2, 1, 0)
        ):
            if scale == 0 and planar_tail:
                res = self._decoder_stage(stage, feat, want_hcw=True)
                if isinstance(res, tuple):
                    feat_hcw, w_out = res
                    (I_t, I_t_0, I_t_1, flow0, flow1, occ1,
                     residual) = self._planar_scale0(
                        feat_hcw, w_out, B, im0_list[0], im1_list[0],
                        im0, im1,
                        (gf0_full, gf1_full) if compose_full else None,
                        skips,
                    )
                    im0_warped_list.insert(0, I_t_0)
                    im1_warped_list.insert(0, I_t_1)
                    im_t_list.insert(0, I_t)
                    planar_done = True
                    break
                # decoder route refused this shape: recover NHWC images
                from atmvfi_tpu.ops.warp_pallas import planar_to_nhwc

                if im0_list[0].ndim == 3:  # planar from the pre-align leg
                    im0_list[0] = planar_to_nhwc(im0_list[0], B)
                    im1_list[0] = planar_to_nhwc(im1_list[0], B)
                feat = res
            else:
                feat = self._decoder_stage(stage, feat)
            out = feat[..., -mo:]
            out_f = out.astype(jnp.float32)
            flow0 = out_f[..., 0:2]
            flow1 = out_f[..., 2:4]
            occ1 = jax.nn.sigmoid(out_f[..., 4:5])
            if scale != 0:
                skips.append(feat[..., :-mo])
            if scale == 0 and compose_full:
                flow0 = flow0 + gf0_full
                flow1 = flow1 + gf1_full
            I_t, I_t_0, I_t_1 = self._warp_blend(
                im0_list[scale], im1_list[scale], flow0, flow1, occ1
            )
            im0_warped_list.insert(0, I_t_0)
            im1_warped_list.insert(0, I_t_1)
            im_t_list.insert(0, I_t)

        if not planar_done:
            residual = self.residual_refinement(
                feat, im0, I_t_0, im1, I_t_1, I_t, skips
            )
        I_t = jnp.clip(I_t + residual.astype(jnp.float32), 0.0, 1.0)

        return {
            "I_t": I_t,
            "im_t_list": im_t_list,  # fine -> coarse
            "im0_warped_list": im0_warped_list,
            "im1_warped_list": im1_warped_list,
            "opt_flow_0": flow0,
            "opt_flow_1": flow1,
            "I_t_0": I_t_0,
            "I_t_1": I_t_1,
            "occ_mask1": occ1,
            "occ_mask2": 1 - occ1,
        }
