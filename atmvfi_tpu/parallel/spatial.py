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


def make_spatial_forward(net, mesh, margin: int = 64,
                         global_motion: bool = True):
    """Height-sharded single-pair serving forward.

    Requires H % (64 * n_spatial) == 0 (the pipeline's pad divisor
    handles this) and margin % 16 == 0. Returns
    forward(variables, im0, im1) with im0/im1 [1, H, W, 3] sharded (or
    shardable) as P(None, 'spatial'); the result I_t carries the same
    sharding."""
    from atmvfi_tpu.models.network import Network
    from atmvfi_tpu.ops.warp_pallas import nhwc_to_planar

    assert margin % 16 == 0, "margin must keep 16-row slab alignment"
    n = mesh.shape[SPATIAL_AXIS]

    def per_shard(variables, im0_loc, im1_loc):
        B, h_loc, W, _ = im0_loc.shape
        assert B == 1, "spatial serving is B == 1"
        H = h_loc * n
        i = jax.lax.axis_index(SPATIAL_AXIS)

        im0f = jax.lax.all_gather(im0_loc, SPATIAL_AXIS, axis=1,
                                  tiled=True)
        im1f = jax.lax.all_gather(im1_loc, SPATIAL_AXIS, axis=1,
                                  tiled=True)

        feat, skips, gf0, gf1 = net.apply(
            variables, im0f, im1f, global_motion=global_motion,
            method=Network.serving_head,
        )

        # slab geometry: [s, s + h_slab) in full-res rows, boundary-
        # shifted so the slab edge is the image edge on edge shards.
        # The margin is clamped so h_slab <= H (tiny per-shard heights
        # degrade gracefully toward full-frame slabs) and floored to
        # 16-row alignment for the HCW kernels' shape gates.
        m = min(margin, (n - 1) * h_loc, (H - h_loc) // 2)
        m = (m // 16) * 16
        h_slab = h_loc + 2 * m
        s = jnp.clip(i * h_loc - m, 0, H - h_slab)
        crop = i * h_loc - s  # shard's true rows inside the slab

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

        it_loc = net.apply(
            variables, feat_slab, skips_slab,
            nhwc_to_planar(im0f), nhwc_to_planar(im1f),
            gf0_slab, gf1_slab, s, crop, h_loc, SPATIAL_AXIS,
            global_motion=global_motion,
            method=Network.serving_tail,
        )
        return it_loc.astype(jnp.float32)

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


def spatial_ici_bytes(H: int, W: int, n: int) -> int:
    """Per-frame inter-chip bytes of the spatial schedule: 4 full-frame
    f32 plane gathers (2 inputs + 2 pre-aligned sources), each shard
    contributing (n-1)/n of the array."""
    per_gather = 3 * H * W * 4
    return int(4 * per_gather * (n - 1) / n)
