"""shard_map serving that KEEPS the Pallas kernels (round-4).

GSPMD cannot partition custom calls, so the automatic-SPMD path
(`InterpolationPipeline(mesh=...)`) must drop every Pallas kernel and
run the 2-3x slower XLA op set per chip (parallel/mesh.py note). This
module is the manual-SPMD alternative: inside `jax.shard_map` each
shard runs an ordinary single-device program — tile-slab warps, HCW
convs, planar tail and all — and the collectives are explicit.

Two schedules:

* `make_dp_forward` — batch ('data') sharding for video streams: each
  chip interpolates its own frame pairs with the FULL single-chip
  kernel stack. Zero collectives; throughput scales linearly with
  chips (latency unchanged). This is the multi-chip route to the
  >= 30 fps 4K north star for streaming workloads.

* `make_spatial_forward` — height ('spatial') sharding of ONE frame
  pair for latency. The forward splits at the scale-0 decoder stage
  (models/network.py serving_head/serving_tail):

    - head (everything at <= 1/2 res) is computed replicated per shard
      on the all-gathered frames — redundant compute, no further
      communication;
    - the full-res tail runs per shard on a slab of
      local rows +- `margin` (one-sided conv receptive field of the
      tail is ~64 full-res rows; edge rows the convs corrupt are
      cropped away). Boundary shards SHIFT the slab inward instead of
      zero-padding, so the slab edge coincides with the true image
      edge and the convs' zero padding keeps global semantics — the
      result is exact at every row, not just away from boundaries;
    - backward warps cannot run on a bounded halo (flows are
      unbounded), so warp sources are all-gathered full frames and the
      source-offset warp ops (ops/warp_pallas.py
      planar_warp_pair_srcfull) sample them at global coordinates —
      exact for any flow magnitude, falling back to the XLA gather
      under the usual per-call exactness cond.

  Per-frame ICI traffic at 4K f32 (B=1): 2 input frames + 2
  pre-aligned frames, each [3, 2176, 3840] ~ 100 MB -> ~400 MB total
  (`spatial_ici_bytes` computes it for arbitrary shapes); everything
  else is shard-local. The head replication is the Amdahl floor —
  measured split lite-4K: see PERF_NOTES round 4.

No reference counterpart (the reference is single-GPU); this is the
SURVEY §2 parallelism-checklist TPU-native ask.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from atmvfi_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS


def _gf_rows_fit(h_slab: int, H: int) -> bool:
    """Static fit check for upsample_flow_rows' intermediate bands
    (each x2 level keeps +-2 extra rows; the band must not exceed the
    level's virtual full height)."""
    ln2 = h_slab // 2 + 4       # 1/2-res band
    ln1 = ln2 // 2 + 4          # 1/4-res band
    return ln2 <= H // 2 and ln1 <= H // 4


def _shard_map(f, mesh, in_specs, out_specs):
    import inspect

    try:
        from jax import shard_map as _sm  # jax >= 0.6 public API
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as _sm
    kw = {}
    params = inspect.signature(_sm).parameters
    # replication checking renamed check_rep -> check_vma across jax
    # versions; disabled either way (manual-collective code)
    if "check_vma" in params:
        kw["check_vma"] = False
    elif "check_rep" in params:
        kw["check_rep"] = False
    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw)


def make_dp_forward(net, mesh, global_motion: bool = True):
    """Batch-sharded serving forward: [B, H, W, 3] x2 -> I_t [B, H, W, 3].

    B must be a multiple of mesh.shape['data']; each shard runs the
    complete single-chip program (all Pallas kernels active)."""

    def per_shard(variables, im0, im1):
        out = net.apply(variables, im0, im1, global_motion=global_motion)
        return jnp.clip(out["I_t"], 0.0, 1.0).astype(jnp.float32)

    fwd = _shard_map(
        per_shard, mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
    )

    def forward(variables, im0, im1):
        n = mesh.shape[DATA_AXIS]
        assert im0.shape[0] % n == 0, (
            f"batch {im0.shape[0]} must divide over {n} 'data' shards"
        )
        return fwd(variables, im0, im1)

    return forward


def make_spatial_forward(net, mesh, margin: int = 96,
                         global_motion: bool = True,
                         ensemble_global_motion: bool = False,
                         deep: bool = True, shard_middle: bool = True):
    """Height-sharded single-pair serving forward.

    Requires H % (16 * n_spatial) == 0 for the deep cut (H % (8 * n)
    for the shallow one — the pipeline's pad divisor handles both) and
    margin % 16 == 0. Returns forward(variables, im0, im1) with
    im0/im1 [1, H, W, 3] sharded (or shardable) as P(None, 'spatial');
    the result I_t carries the same sharding.

    deep=True (default, round-5): three-way cut — the conv FRONT
    (encoder + both cross-scale fusions) runs per shard on a full-res
    row slab, the 1/8 + 1/16 token maps are all-gathered, the
    attention MIDDLE runs mostly per shard too (see below), and the
    TAIL (all three decoder stages + blends + refiner) runs per shard.
    deep=False keeps the round-4 shallow cut (head replicated through
    decoder stage 1). Ensemble mode forces the shallow cut: its
    multiscale global estimate re-runs the encoder at three scales on
    the full frames (network.py serving_head), which the slab front
    cannot shard.

    shard_middle=True (default): the local-attention stack (2 ATM
    blocks + motion MLP + 2 enhancement blocks) runs per shard on an
    8-row-aligned 1/8 slab with a 32-row halo — window attention is
    window-local except at shifted boundaries, and a shifted block's
    slab-local wrap (roll + edge-window mask) only corrupts the
    outermost window rows, absorbed by the halo. Replicated remainder:
    the global branch (1/16, small), the token pre-align warp and the
    decoder-input feature warps (backward warps read wherever flow
    points -> full maps), and the 2-channel full-res flow upsample.
    """
    from atmvfi_tpu.models.network import Network
    from atmvfi_tpu.ops.warp_pallas import nhwc_to_planar

    assert margin % 16 == 0, "margin must keep 16-row slab alignment"
    n = mesh.shape[SPATIAL_AXIS]
    if ensemble_global_motion:
        deep = False
        assert global_motion, "ensemble mode implies global_motion"

    def slab_geometry(H, h_loc, i):
        """[s, s + h_slab) in full-res rows, boundary-shifted so the
        slab edge is the image edge on edge shards. The margin is
        clamped so h_slab <= H (tiny per-shard heights degrade
        gracefully toward full-frame slabs) and floored to 16-row
        alignment for the HCW kernels' shape gates and the strided
        convs' global-grid alignment."""
        m = min(margin, (n - 1) * h_loc, (H - h_loc) // 2)
        m = (m // 16) * 16
        h_slab = h_loc + 2 * m
        s = jnp.clip(i * h_loc - m, 0, H - h_slab)
        crop = i * h_loc - s  # shard's true rows inside the slab
        return s, h_slab, crop

    def per_shard_shallow(variables, im0f, im1f, h_loc, i):
        H = im0f.shape[1]
        feat, skips, gf0, gf1 = net.apply(
            variables, im0f, im1f, global_motion=global_motion,
            ensemble_global_motion=ensemble_global_motion,
            method=Network.serving_head,
        )
        s, h_slab, crop = slab_geometry(H, h_loc, i)
        feat_slab = jax.lax.dynamic_slice_in_dim(
            feat, s // 2, h_slab // 2, 1
        )
        skips_slab = [
            jax.lax.dynamic_slice_in_dim(skips[0], s // 4, h_slab // 4, 1),
            jax.lax.dynamic_slice_in_dim(skips[1], s // 2, h_slab // 2, 1),
        ]
        gf0_slab = gf1_slab = None
        if global_motion:
            gf0_slab = jax.lax.dynamic_slice_in_dim(gf0, s, h_slab, 1)
            gf1_slab = jax.lax.dynamic_slice_in_dim(gf1, s, h_slab, 1)
        return net.apply(
            variables, feat_slab, skips_slab,
            nhwc_to_planar(im0f), nhwc_to_planar(im1f),
            gf0_slab, gf1_slab, s, crop, h_loc, SPATIAL_AXIS,
            global_motion=global_motion,
            method=Network.serving_tail,
        )

    def per_shard_deep(variables, im0f, im1f, h_loc, i):
        H = im0f.shape[1]
        s, h_slab, crop = slab_geometry(H, h_loc, i)

        # ---- sharded conv front on the full-res slab ----
        im0s = jax.lax.dynamic_slice_in_dim(im0f, s, h_slab, 1)
        im1s = jax.lax.dynamic_slice_in_dim(im1f, s, h_slab, 1)
        feat_s, gtok_s = net.apply(
            variables, im0s, im1s, global_motion=global_motion,
            method=Network.serving_front,
        )
        # crop the slab's corrupted edges to the shard's true token
        # rows and gather the full maps (tiny vs the frame gathers)
        feat8 = jax.lax.all_gather(
            jax.lax.dynamic_slice_in_dim(feat_s, crop // 8, h_loc // 8, 1),
            SPATIAL_AXIS, axis=1, tiled=True,
        )
        gtok = None
        if global_motion:
            gtok = jax.lax.all_gather(
                jax.lax.dynamic_slice_in_dim(
                    gtok_s, crop // 16, h_loc // 16, 1
                ),
                SPATIAL_AXIS, axis=1, tiled=True,
            )

        # ---- attention middle ----
        H8 = H // 8
        h8_loc = h_loc // 8
        s8, hs8 = s // 8, h_slab // 8
        if shard_middle and H8 % 8 == 0:
            # replicated: ONLY the global branch + flow upsamples; the
            # token pre-align and decoder-input warps read full maps
            # but their OUTPUTS are row-local, so they run per shard
            # via the source-offset row warps (ops.flow_warp_rows)
            if global_motion:
                gf8_0, gf8_1, gf0, gf1 = net.apply(
                    variables, gtok, method=Network.serving_middle_flows,
                )
            else:
                gf0 = gf1 = None
            # attention slab: 8-row-aligned 1/8 slab with a halo that
            # absorbs shifted-window wrap + conv receptive fields
            # (~22 rows measured worst-case; 32 + up to 8 alignment
            # skew). Slab bounds (not the true-row crop) must land on
            # the global window grid.
            ha = 32
            a_len = min(-(-(h8_loc + 2 * ha + 8) // 8) * 8, H8)
            a0 = jnp.clip(
                ((i * h8_loc - ha) // 8) * 8, 0, H8 - a_len
            )
            acrop = i * h8_loc - a0
            if global_motion:
                feat_slab = net.apply(
                    variables, feat8,
                    jax.lax.dynamic_slice_in_dim(gf8_0, a0, a_len, 1),
                    jax.lax.dynamic_slice_in_dim(gf8_1, a0, a_len, 1),
                    a0, method=Network.serving_middle_align_rows,
                )
            else:
                feat_slab = jax.lax.dynamic_slice_in_dim(
                    feat8, a0, a_len, 1
                )
            enh_s, out_s = net.apply(
                variables, feat_slab,
                method=Network.serving_middle_attn,
            )
            enh = jax.lax.all_gather(
                jax.lax.dynamic_slice_in_dim(enh_s, acrop, h8_loc, 1),
                SPATIAL_AXIS, axis=1, tiled=True,
            )
            out = jax.lax.all_gather(
                jax.lax.dynamic_slice_in_dim(out_s, acrop, h8_loc, 1),
                SPATIAL_AXIS, axis=1, tiled=True,
            )
            # decoder input assembled directly on the tail slab rows
            dec_slab = net.apply(
                variables, enh,
                jax.lax.dynamic_slice_in_dim(out, s8, hs8, 1), s8,
                method=Network.serving_middle_decin_rows,
            )
            # full-res global-flow slab via the row-banded upsample
            # chain (bit-exact vs the full chain) — the full-res
            # upsample in serving_middle_flows then DCEs; fall back to
            # slicing it when the intermediate bands don't fit (tiny
            # frames where the slab clamps toward full height)
            if global_motion and _gf_rows_fit(h_slab, H):
                from atmvfi_tpu.ops.resize import upsample_flow_rows

                lv = net.cfg.pyramid_level - 1
                gf0_slab = upsample_flow_rows(gf8_0, lv, s, h_slab)
                gf1_slab = upsample_flow_rows(gf8_1, lv, s, h_slab)
                return net.apply(
                    variables, dec_slab,
                    nhwc_to_planar(im0f), nhwc_to_planar(im1f),
                    gf0_slab, gf1_slab, s, crop, h_loc, SPATIAL_AXIS,
                    global_motion=global_motion,
                    method=Network.serving_tail_deep,
                )
        else:
            dec_in, gf0, gf1 = net.apply(
                variables, feat8, gtok, global_motion=global_motion,
                method=Network.serving_middle,
            )
            dec_slab = jax.lax.dynamic_slice_in_dim(dec_in, s8, hs8, 1)

        # ---- sharded tail: decoder stages 2-0 + refiner on the slab ----
        gf0_slab = gf1_slab = None
        if global_motion:
            gf0_slab = jax.lax.dynamic_slice_in_dim(gf0, s, h_slab, 1)
            gf1_slab = jax.lax.dynamic_slice_in_dim(gf1, s, h_slab, 1)
        return net.apply(
            variables, dec_slab,
            nhwc_to_planar(im0f), nhwc_to_planar(im1f),
            gf0_slab, gf1_slab, s, crop, h_loc, SPATIAL_AXIS,
            global_motion=global_motion,
            method=Network.serving_tail_deep,
        )

    def per_shard(variables, im0_loc, im1_loc):
        B, h_loc, W, _ = im0_loc.shape
        assert B == 1, "spatial serving is B == 1"
        H = h_loc * n
        i = jax.lax.axis_index(SPATIAL_AXIS)

        im0f = jax.lax.all_gather(im0_loc, SPATIAL_AXIS, axis=1,
                                  tiled=True)
        im1f = jax.lax.all_gather(im1_loc, SPATIAL_AXIS, axis=1,
                                  tiled=True)
        body = per_shard_deep if (deep and h_loc % 16 == 0) \
            else per_shard_shallow
        return body(variables, im0f, im1f, h_loc, i).astype(jnp.float32)

    fwd = _shard_map(
        per_shard, mesh,
        in_specs=(P(), P(None, SPATIAL_AXIS), P(None, SPATIAL_AXIS)),
        out_specs=P(None, SPATIAL_AXIS),
    )

    def forward(variables, im0, im1):
        H = im0.shape[1]
        assert H % (8 * n) == 0, (
            f"H={H} must divide over {n} spatial shards in 8-row units"
        )
        return fwd(variables, im0, im1)

    return forward


def make_deep_shard_sim(net, H: int, W: int, n: int, margin: int = 96,
                        global_motion: bool = True,
                        shard_middle: bool = True):
    """Single-chip jit-able simulation of ONE shard's DEEP-schedule
    program (shard i=1, the interior slab): front on the slab,
    replicated attention middle, deep tail on the slab. Collectives
    are replaced by shape-preserving stand-ins (token tiling / in-slab
    warps), so this measures per-shard TIME on one chip; the ICI term
    is added analytically from `spatial_ici_bytes_deep`. Used by
    bench.py's `spatial_projected_fps_{n}` extras and
    scripts/tpu_spatial_check.py; exactness of the real collective
    schedule is tested separately (tests/test_spatial.py, dryrun
    check 4)."""
    from atmvfi_tpu.models.network import Network
    from atmvfi_tpu.ops.warp_pallas import nhwc_to_planar

    h_loc = H // n
    assert h_loc % 16 == 0
    m = min(margin, (n - 1) * h_loc, (H - h_loc) // 2)
    m = (m // 16) * 16
    h_slab = h_loc + 2 * m
    i = min(1, n - 1)
    s = min(max(i * h_loc - m, 0), H - h_slab)
    crop = i * h_loc - s

    def f(variables, a, b):
        a_s = a[:, s : s + h_slab]
        b_s = b[:, s : s + h_slab]
        feat_s, gtok_s = net.apply(
            variables, a_s, b_s, global_motion=global_motion,
            method=Network.serving_front,
        )
        f8 = jnp.concatenate(
            [feat_s[:, crop // 8 : (crop + h_loc) // 8]] * n, axis=1
        )
        g16 = None
        if global_motion:
            g16 = jnp.concatenate(
                [gtok_s[:, crop // 16 : (crop + h_loc) // 16]] * n, axis=1
            )
        H8 = H // 8
        h8_loc = h_loc // 8
        s8, hs8 = s // 8, h_slab // 8
        if shard_middle and H8 % 8 == 0:
            gf0 = gf1 = None
            ha = 32
            a_len = min(-(-(h8_loc + 2 * ha + 8) // 8) * 8, H8)
            a0 = min(max(((i * h8_loc - ha) // 8) * 8, 0), H8 - a_len)
            acrop = i * h8_loc - a0
            if global_motion:
                gf8_0, gf8_1, gf0, gf1 = net.apply(
                    variables, g16, method=Network.serving_middle_flows,
                )
                feat_slab = net.apply(
                    variables, f8, gf8_0[:, a0 : a0 + a_len],
                    gf8_1[:, a0 : a0 + a_len], a0,
                    method=Network.serving_middle_align_rows,
                )
            else:
                feat_slab = f8[:, a0 : a0 + a_len]
            enh_s, out_s = net.apply(
                variables, feat_slab,
                method=Network.serving_middle_attn,
            )
            enh = jnp.concatenate(
                [enh_s[:, acrop : acrop + h8_loc]] * n, axis=1
            )
            out = jnp.concatenate(
                [out_s[:, acrop : acrop + h8_loc]] * n, axis=1
            )
            dec_slab = net.apply(
                variables, enh, out[:, s8 : s8 + hs8], s8,
                method=Network.serving_middle_decin_rows,
            )
            if global_motion and _gf_rows_fit(h_slab, H):
                from atmvfi_tpu.ops.resize import upsample_flow_rows

                lv = net.cfg.pyramid_level - 1
                gf0 = upsample_flow_rows(gf8_0, lv, s, h_slab)
                gf1 = upsample_flow_rows(gf8_1, lv, s, h_slab)
                return net.apply(
                    variables, dec_slab, nhwc_to_planar(a),
                    nhwc_to_planar(b), gf0, gf1, jnp.int32(s),
                    jnp.int32(crop), h_loc, None,
                    global_motion=global_motion,
                    method=Network.serving_tail_deep,
                )
        else:
            dec_in, gf0, gf1 = net.apply(
                variables, f8, g16, global_motion=global_motion,
                method=Network.serving_middle,
            )
            dec_slab = dec_in[:, s8 : s8 + hs8]
        gf0_s = gf1_s = None
        if global_motion:
            gf0_s = gf0[:, s : s + h_slab]
            gf1_s = gf1[:, s : s + h_slab]
        return net.apply(
            variables, dec_slab,
            nhwc_to_planar(a), nhwc_to_planar(b), gf0_s, gf1_s,
            jnp.int32(s), jnp.int32(crop), h_loc, None,
            global_motion=global_motion,
            method=Network.serving_tail_deep,
        )

    return f


def spatial_ici_bytes(H: int, W: int, n: int) -> int:
    """Per-frame inter-chip bytes of the SHALLOW spatial schedule: 4
    full-frame f32 plane gathers (2 inputs + 2 pre-aligned sources),
    each shard contributing (n-1)/n of the array."""
    per_gather = 3 * H * W * 4
    return int(4 * per_gather * (n - 1) / n)


def spatial_ici_bytes_deep(H: int, W: int, n: int, fused_dim: int,
                           global_dim: int, token_bytes: int = 2,
                           global_motion: bool = True,
                           shard_middle: bool = True) -> int:
    """Per-frame inter-chip bytes of the DEEP spatial schedule: the 4
    full-frame f32 plane gathers of the shallow cut PLUS the 1/8 fused
    token map ([2, H/8, W/8, fused_dim]) and, with global motion, the
    1/16 global token map ([2, H/16, W/16, global_dim]) — cfg.dtype
    sized (bf16 on TPU). The sharded middle adds the enhanced-feature
    gather ([1, H/8, W/8, 2*fused_dim]) + the 5ch motion head (f32)."""
    b = spatial_ici_bytes(H, W, n)
    tok = 2 * (H // 8) * (W // 8) * fused_dim * token_bytes
    if global_motion:
        tok += 2 * (H // 16) * (W // 16) * global_dim * token_bytes
    if shard_middle:
        tok += (H // 8) * (W // 8) * (
            2 * fused_dim * token_bytes + 5 * 4
        )
    return int(b + tok * (n - 1) / n)
