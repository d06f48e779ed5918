"""Backward (bilinear) warping — TPU-native `grid_sample` equivalent.

Implements the exact semantics of the reference warp path
(/root/reference/network/flow_warp.py:26-60): sample `feature` at
``pixel_grid + flow`` with bilinear interpolation, ``align_corners=True``
and ``padding_mode='zeros'`` — i.e. each of the 4 taps that falls outside
the image contributes exactly zero (no clamping).

Design notes (TPU):
  * NHWC layout; the gather is over the flattened H*W axis with the
    channel axis contiguous, which XLA lowers to an efficient dynamic
    gather on TPU.
  * The reference normalizes coords to [-1, 1] and lets grid_sample
    un-normalize them; algebraically that is the identity on pixel
    coords, so we skip the round-trip (the fp error is < 1e-5 px).
  * The whole op is differentiable; gradients flow to both `feature`
    and `flow` (as with grid_sample).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def coords_grid(b: int, h: int, w: int) -> jnp.ndarray:
    """[B, H, W, 2] (x, y) pixel grid. Parity: flow_warp.py:7-23 (NHWC).

    iota-generated (an on-device op XLA fuses into consumers), NOT a
    numpy constant: a materialized [H, W, 2] literal lands in the
    default layout with the 2-vector in the lane dim — 64x tile
    padding, ~4 GB of HBM at 4K, permanently resident as a 'global'
    allocation in every graph that embeds it."""
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    grid = jnp.stack([xs, ys], axis=-1)
    return jnp.broadcast_to(grid, (b, h, w, 2))


def grid_sample_bilinear(
    img: jnp.ndarray, coords: jnp.ndarray, return_mask: bool = False
):
    """Sample `img` [B, H, W, C] at pixel `coords` [B, Ho, Wo, 2] (x, y).

    Out-of-range taps contribute zero (padding_mode='zeros',
    align_corners=True). Returns [B, Ho, Wo, C] (and optionally the
    in-range mask [B, Ho, Wo] like bilinear_sample(return_mask=True)).
    """
    cdtype = jnp.promote_types(coords.dtype, jnp.float32)
    return _sample_xy(
        img,
        coords[..., 0].astype(cdtype),
        coords[..., 1].astype(cdtype),
        return_mask,
    )


def _sample_xy(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
               return_mask: bool = False):
    """grid_sample_bilinear on per-component coords [B, Ho, Wo] — the
    internal form: no [.., 2]-last tensor exists anywhere, so nothing
    can materialize in the 64x-padded channels-last default layout."""
    B, H, W, C = img.shape
    _, Ho, Wo = x.shape
    orig_dtype = img.dtype

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def wgt(xi, yi, w, dtype):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        return jnp.where(valid, w, 0.0).astype(dtype)[..., None]

    # Corner-block gather pays 4x image bytes for ~2x fewer effective
    # index ops — a win for small-C images until HBM pressure at very
    # large resolutions makes the extra 4x materialization trigger
    # rematerialization (4K-class inputs measured slower with it).
    if C <= 32 and H * W <= 2**22:
        # Small-C (images): TPU gathers are index-rate bound, so
        # materialize a "corner block" image whose pixel (y+1, x+1)
        # holds the 2x2xC bilinear footprint at (y, x) (four shifted
        # copies — pure streaming) and do ONE row-gather of 4C
        # contiguous values per output pixel — measured ~2x faster than
        # four C-row gathers (scripts/warp_variants_bench.py). The zero
        # border realizes 'zeros' padding for near-edge taps; far
        # out-of-range taps are killed by the validity weights.
        pad = jnp.pad(img, ((0, 0), (1, 2), (1, 2), (0, 0)))
        blocks = jnp.concatenate(
            [pad[:, :-1, :-1], pad[:, :-1, 1:], pad[:, 1:, :-1], pad[:, 1:, 1:]],
            axis=-1,
        )  # [B, H+2, W+2, 4C]
        Hp, Wp = H + 2, W + 2
        ys = jnp.clip(y0i, -1, H - 1) + 1
        xs = jnp.clip(x0i, -1, W - 1) + 1
        flat = (ys * Wp + xs).reshape(B, Ho * Wo)
        g = jnp.take_along_axis(
            blocks.reshape(B, Hp * Wp, 4 * C), flat[..., None], axis=1
        ).reshape(B, Ho, Wo, 4, C)
        out = (
            g[..., 0, :] * wgt(x0i, y0i, (1 - wx1) * (1 - wy1), g.dtype)
            + g[..., 1, :] * wgt(x0i + 1, y0i, wx1 * (1 - wy1), g.dtype)
            + g[..., 2, :] * wgt(x0i, y0i + 1, (1 - wx1) * wy1, g.dtype)
            + g[..., 3, :] * wgt(x0i + 1, y0i + 1, wx1 * wy1, g.dtype)
        ).astype(orig_dtype)
    else:
        # Large-C (feature maps): rows are already wide, gathers are
        # bytes-bound — four per-tap row gathers avoid the 4x byte
        # blow-up of the corner-block form.
        img_flat = img.reshape(B, H * W, C)

        def tap(xi, yi, w):
            xc = jnp.clip(xi, 0, W - 1)
            yc = jnp.clip(yi, 0, H - 1)
            flat = (yc * W + xc).reshape(B, Ho * Wo)
            vals = jnp.take_along_axis(img_flat, flat[..., None], axis=1)
            vals = vals.reshape(B, Ho, Wo, C)
            return vals * wgt(xi, yi, w, vals.dtype)

        out = (
            tap(x0i, y0i, (1 - wx1) * (1 - wy1))
            + tap(x0i + 1, y0i, wx1 * (1 - wy1))
            + tap(x0i, y0i + 1, (1 - wx1) * wy1)
            + tap(x0i + 1, y0i + 1, wx1 * wy1)
        ).astype(orig_dtype)

    if return_mask:
        # Parity with bilinear_sample(return_mask=True): mask of samples
        # whose normalized coords lie in [-1, 1] (flow_warp.py:42-45).
        mask = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
        return out, mask
    return out


def flow_warp_rows(feature: jnp.ndarray, flow_rows: jnp.ndarray, row0,
                   return_mask: bool = False):
    """Backward-warp onto OUTPUT rows [row0, row0 + h_s) only.

    feature: [B, H, W, C] FULL source (backward warps read wherever the
    flow points, so the source cannot be sliced); flow_rows:
    [B, h_s, W, 2] the flow at those output rows; row0: (traced) global
    row of output row 0 — folded into the y sample coordinate, exactly
    the source-offset trick of planar_warp_pair_srcfull lifted to NHWC
    feature maps. Row-for-row equal to flow_warp(feature, flow)[rows].
    Used by the spatial serving schedule to compute the token pre-align
    and decoder-input feature warps per shard (round 5)."""
    b, h_s, w, _ = flow_rows.shape
    cdtype = jnp.promote_types(flow_rows.dtype, jnp.float32)
    x = jax.lax.broadcasted_iota(cdtype, (h_s, w), 1) \
        + flow_rows[..., 0].astype(cdtype)
    y = jax.lax.broadcasted_iota(cdtype, (h_s, w), 0) \
        + jnp.asarray(row0).astype(cdtype) \
        + flow_rows[..., 1].astype(cdtype)
    return _sample_xy(feature, x, y, return_mask)


def flow_warp(feature: jnp.ndarray, flow: jnp.ndarray, return_mask: bool = False):
    """Backward-warp `feature` [B, H, W, C] by `flow` [B, H, W, 2] (x, y).

    Parity: flow_warp (reference flow_warp.py:50-60), NHWC layout.
    Coords are built per component (iota + flow channel) so no
    [B, H, W, 2] coordinate tensor is ever materialized (see
    coords_grid on why that layout costs 64x).
    """
    b, h, w, _ = feature.shape
    cdtype = jnp.promote_types(flow.dtype, jnp.float32)
    x = jax.lax.broadcasted_iota(cdtype, (h, w), 1) + flow[..., 0].astype(cdtype)
    y = jax.lax.broadcasted_iota(cdtype, (h, w), 0) + flow[..., 1].astype(cdtype)
    return _sample_xy(feature, x, y, return_mask)
