"""Tile-slab backward-warp Pallas TPU kernel (exact, with XLA fallback).

TPU has no vectorized arbitrary gather: XLA lowers `grid_sample`-style
gathers to serial while-loops (~1.2G elem/s — ~30% of frame time at
1080p, see PERF_NOTES.md). Mosaic *does* support a 128-lane-wide
take_along_axis (32-bit, idx shape == data shape) and scalar-prefetch
driven BlockSpec index maps (probed in scripts/pallas_probe2.py). This
kernel exploits flow smoothness:

  * the output is tiled 8x128; for each tile an (S x 384) slab (three
    adjacent 128-lane pages, 8-aligned rows) of the source image is
    DMA'd into VMEM, positioned by per-tile flow minima
    (scalar-prefetched; DMA origins must be (8,128)-aligned);
  * inside the kernel an unrolled loop over the S slab rows
    reconstructs the exact 4-tap bilinear sample with per-lane gathers
    and row-match selects — bit-compatible with ops.warp semantics
    (zeros padding, align_corners, per-tap validity);
  * a per-call `lax.cond` falls back to the exact XLA gather whenever
    any tile's flow spread exceeds the slab (S-1 rows / 254 cols), so
    the op is ALWAYS exact.

Layouts: kernel-side images are [C, B*H, W] f32 (lane gathers are
32-bit only); the public wrapper takes/returns NHWC like ops.flow_warp.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atmvfi_tpu.ops import warp as warp_xla

TILE_H = 8
TILE_W = 128


def _kernel(ymin_ref, xmin_ref, img_ref, flow_ref, out_ref, slab_ref, sem,
            *, H, W, C, S, n_tw, dtype):
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    th = t // n_tw
    tw = t % n_tw

    # Double-buffered DMA of the (C, S, 3*128) source slab: rows start
    # at the per-tile prefetched 8-aligned minimum, columns at the
    # 128-aligned page triple covering the tile's x-range.
    def slab_dma(slot, tile):
        return pltpu.make_async_copy(
            img_ref.at[
                :,
                pl.ds(pl.multiple_of(ymin_ref[tile], TILE_H), S),
                pl.ds(pl.multiple_of(xmin_ref[tile], TILE_W), 3 * TILE_W),
            ],
            slab_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(t == 0)
    def _():
        slab_dma(0, 0).start()

    @pl.when(t + 1 < n_t)
    def _():
        slab_dma((t + 1) % 2, t + 1).start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    gr = th * TILE_H + rows                     # global output row (B*H space)
    b = gr // H
    y_img = gr - b * H
    x = tw * TILE_W + cols

    fx = flow_ref[0]  # planar [2, th, tw] flow block: no lane padding
    fy = flow_ref[1]
    sx = x.astype(jnp.float32) + fx
    sy = y_img.astype(jnp.float32) + fy
    x0f = jnp.floor(sx)
    y0f = jnp.floor(sy)
    wx = sx - x0f
    wy = sy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def valid(xi, yi):
        return ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)).astype(
            jnp.float32
        )

    w00 = (1 - wx) * (1 - wy) * valid(x0, y0)
    w01 = wx * (1 - wy) * valid(x0 + 1, y0)
    w10 = (1 - wx) * wy * valid(x0, y0 + 1)
    w11 = wx * wy * valid(x0 + 1, y0 + 1)

    # slab-relative coordinates. Each tap is clipped INDEPENDENTLY:
    # e.g. y0 = -1 must leave the (valid) bottom tap at row 0, so the
    # bottom row cannot be derived as top+1 (clamping would skew it).
    # Clipped-but-invalid taps carry zero weight, so their (wrong)
    # clamped positions are harmless.
    base = b * H - ymin_ref[t]
    r_top = jnp.clip(jnp.clip(y0, 0, H - 1) + base, 0, S - 1)
    r_bot = jnp.clip(jnp.clip(y0 + 1, 0, H - 1) + base, 0, S - 1)
    c0 = jnp.clip(jnp.clip(x0, 0, W - 1) - xmin_ref[t], 0, 3 * TILE_W - 1)
    c1 = jnp.clip(jnp.clip(x0 + 1, 0, W - 1) - xmin_ref[t], 0, 3 * TILE_W - 1)

    def page_coords(c):
        page1 = (c >= TILE_W) & (c < 2 * TILE_W)
        page2 = c >= 2 * TILE_W
        cp = jnp.where(page1, c - TILE_W,
                       jnp.where(page2, c - 2 * TILE_W, c))
        return page1, page2, jnp.clip(cp, 0, TILE_W - 1)

    p1_0, p2_0, cp0 = page_coords(c0)
    p1_1, p2_1, cp1 = page_coords(c1)

    slab_dma(t % 2, t).wait()
    slot = t % 2

    # Mosaic can't broadcast a single slab row across sublanes, so the
    # slab is consumed in native (8, 128) blocks: sublane-roll d makes
    # sublane i hold slab row q*8 + (i+d)%8, whose id is then matched
    # against the per-pixel source row r. Whole q-blocks outside the
    # tile's actual row range are skipped (flow is smooth, so most
    # tiles touch only 1-2 of the S/8 blocks).
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    r_lo = jnp.min(r_top)
    r_hi = jnp.max(r_bot)
    for ch in range(C):
        out_ref[ch] = jnp.zeros((TILE_H, TILE_W), out_ref.dtype)
    for q in range(S // TILE_H):
        @pl.when((q * TILE_H <= r_hi) & (r_lo < (q + 1) * TILE_H))
        def _(q=q):
            for ch in range(C):
                acc = jnp.zeros((TILE_H, TILE_W), jnp.float32)
                blk = slab_ref[slot, ch, q * TILE_H : (q + 1) * TILE_H, :]
                blk_a = blk[:, :TILE_W]
                blk_b = blk[:, TILE_W : 2 * TILE_W]
                blk_c = blk[:, 2 * TILE_W :]
                for d in range(TILE_H):
                    # roll(x, n-d)[i] == x[(i+d) % n] (shift must be >= 0)
                    shift = (TILE_H - d) % TILE_H
                    rows_a = pltpu.roll(blk_a, shift, 0) if d else blk_a
                    rows_b = pltpu.roll(blk_b, shift, 0) if d else blk_b
                    rows_c = pltpu.roll(blk_c, shift, 0) if d else blk_c
                    srow = q * TILE_H + (iota_i + d) % TILE_H

                    def gather3(p1, p2, cp):
                        g = jnp.take_along_axis(rows_a, cp, axis=1)
                        g = jnp.where(
                            p1, jnp.take_along_axis(rows_b, cp, axis=1), g
                        )
                        return jnp.where(
                            p2, jnp.take_along_axis(rows_c, cp, axis=1), g
                        )

                    g0 = gather3(p1_0, p2_0, cp0)
                    g1 = gather3(p1_1, p2_1, cp1)
                    top = (r_top == srow).astype(jnp.float32)
                    bot = (r_bot == srow).astype(jnp.float32)
                    acc = acc + top * (w00 * g0 + w01 * g1)
                    acc = acc + bot * (w10 * g0 + w11 * g1)
                out_ref[ch] += acc.astype(out_ref.dtype)


def _kernel_v2(ymin_ref, xmin_ref, img_ref, flow_ref, out_ref, slab_ref,
               sem, *, H, W, C, S, n_tw, dtype):
    """Span-loop inner structure (v2): instead of statically scanning
    all 8 sublane offsets of every active q-block (3 rolls + 6 gathers
    per (ch, q, d) — ~16-24 iterations/ch for typical flows), iterate
    u over the tile's ACTUAL spread of t = source_row - sublane_index.
    For smooth flows t is nearly constant across the tile (it's the
    flow's y-displacement), so the dynamic-bound fori_loop runs only
    spread+1 (~2-4) iterations/ch; each aligns slab row (u + i) onto
    sublane i with ONE whole-slab roll (modular, so border tiles where
    t < 0 wrap and simply never match). Same slab DMA, extents, and
    exactness semantics as _kernel."""
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    th = t // n_tw
    tw = t % n_tw

    def slab_dma(slot, tile):
        return pltpu.make_async_copy(
            img_ref.at[
                :,
                pl.ds(pl.multiple_of(ymin_ref[tile], TILE_H), S),
                pl.ds(pl.multiple_of(xmin_ref[tile], TILE_W), 3 * TILE_W),
            ],
            slab_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(t == 0)
    def _():
        slab_dma(0, 0).start()

    @pl.when(t + 1 < n_t)
    def _():
        slab_dma((t + 1) % 2, t + 1).start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    gr = th * TILE_H + rows                     # global output row (B*H space)
    b = gr // H
    y_img = gr - b * H
    x = tw * TILE_W + cols

    fx = flow_ref[0]  # planar [2, th, tw] flow block: no lane padding
    fy = flow_ref[1]
    sx = x.astype(jnp.float32) + fx
    sy = y_img.astype(jnp.float32) + fy
    x0f = jnp.floor(sx)
    y0f = jnp.floor(sy)
    wx = sx - x0f
    wy = sy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def valid(xi, yi):
        return ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)).astype(
            jnp.float32
        )

    w00 = (1 - wx) * (1 - wy) * valid(x0, y0)
    w01 = wx * (1 - wy) * valid(x0 + 1, y0)
    w10 = (1 - wx) * wy * valid(x0, y0 + 1)
    w11 = wx * wy * valid(x0 + 1, y0 + 1)

    # slab-relative coordinates (independent per-tap clipping, see
    # _kernel)
    base = b * H - ymin_ref[t]
    r_top = jnp.clip(jnp.clip(y0, 0, H - 1) + base, 0, S - 1)
    r_bot = jnp.clip(jnp.clip(y0 + 1, 0, H - 1) + base, 0, S - 1)
    c0 = jnp.clip(jnp.clip(x0, 0, W - 1) - xmin_ref[t], 0, 3 * TILE_W - 1)
    c1 = jnp.clip(jnp.clip(x0 + 1, 0, W - 1) - xmin_ref[t], 0, 3 * TILE_W - 1)

    def page_coords(c):
        page1 = (c >= TILE_W) & (c < 2 * TILE_W)
        page2 = c >= 2 * TILE_W
        cp = jnp.where(page1, c - TILE_W,
                       jnp.where(page2, c - 2 * TILE_W, c))
        return page1, page2, jnp.clip(cp, 0, TILE_W - 1)

    p1_0, p2_0, cp0 = page_coords(c0)
    p1_1, p2_1, cp1 = page_coords(c1)

    slab_dma(t % 2, t).wait()
    slot = t % 2

    iota_i = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    t_top = r_top - iota_i                      # [-7, S-1]
    t_bot = r_bot - iota_i
    u_lo = jnp.min(t_top)
    n_u = jnp.max(t_bot) - u_lo + 1             # dynamic trip count

    for ch in range(C):
        def body(u, acc, ch=ch):
            start = u_lo + u                    # may be negative: wraps
            shift = (-start) % S                # roll so slab[start+i]->sublane i
            rolled = pltpu.roll(slab_ref[slot, ch], shift, 0)[:TILE_H]
            rows_a = rolled[:, :TILE_W]
            rows_b = rolled[:, TILE_W : 2 * TILE_W]
            rows_c = rolled[:, 2 * TILE_W :]

            def gather3(p1, p2, cp):
                g = jnp.take_along_axis(rows_a, cp, axis=1)
                g = jnp.where(
                    p1, jnp.take_along_axis(rows_b, cp, axis=1), g
                )
                return jnp.where(
                    p2, jnp.take_along_axis(rows_c, cp, axis=1), g
                )

            g0 = gather3(p1_0, p2_0, cp0)
            g1 = gather3(p1_1, p2_1, cp1)
            top = (t_top == start).astype(jnp.float32)
            bot = (t_bot == start).astype(jnp.float32)
            acc = acc + top * (w00 * g0 + w01 * g1)
            return acc + bot * (w10 * g0 + w11 * g1)

        acc = jax.lax.fori_loop(
            0, n_u, body, jnp.zeros((TILE_H, TILE_W), jnp.float32)
        )
        out_ref[ch] = acc.astype(out_ref.dtype)


def _kernel_v3(ymin_ref, xmin_ref, img_ref, flow_ref, out_ref, slab_ref,
               sem, *, H, W, C, S, n_tw, dtype):
    """Windowed span-loop (v3): same dynamic-trip row span as _kernel_v2
    but each iteration touches a 16-row slab WINDOW instead of rolling
    the whole (S, 384) slab:

      * the span row `start` lives in 8-row block qb = start//8 (clipped
        so qb+1 exists); a dynamic 8-aligned `pl.ds` load grabs rows
        [8qb, 8qb+16) — 6 vregs instead of the 24-vreg whole-slab roll;
      * one modular roll of that window aligns slab row (start+i) onto
        sublane i; indices that wrap read garbage rows that can never
        match (their true source row is outside the window), so the
        row-match selects zero them — same masking argument as v2's
        whole-slab wrap;
      * the row-match masks and the 4 bilinear tap weights are folded
        ONCE per span row into two per-column-tap weights (wt0, wt1),
        hoisted out of the channel loop (v2 recomputed 2 compares + 6
        multiplies per channel per row).

    Per (row, channel) cost: 1 window load + 1 roll + 6 lane gathers +
    2 FMAs, vs v2's whole-slab roll + 6 gathers + ~12 elementwise —
    ~2x less VPU work at C=3. Exactness semantics identical."""
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    th = t // n_tw
    tw = t % n_tw

    def slab_dma(slot, tile):
        return pltpu.make_async_copy(
            img_ref.at[
                :,
                pl.ds(pl.multiple_of(ymin_ref[tile], TILE_H), S),
                pl.ds(pl.multiple_of(xmin_ref[tile], TILE_W), 3 * TILE_W),
            ],
            slab_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(t == 0)
    def _():
        slab_dma(0, 0).start()

    @pl.when(t + 1 < n_t)
    def _():
        slab_dma((t + 1) % 2, t + 1).start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    gr = th * TILE_H + rows                     # global output row (B*H space)
    b = gr // H
    y_img = gr - b * H
    x = tw * TILE_W + cols

    fx = flow_ref[0]  # planar [2, th, tw] flow block: no lane padding
    fy = flow_ref[1]
    sx = x.astype(jnp.float32) + fx
    sy = y_img.astype(jnp.float32) + fy
    x0f = jnp.floor(sx)
    y0f = jnp.floor(sy)
    wx = sx - x0f
    wy = sy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def valid(xi, yi):
        return ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)).astype(
            jnp.float32
        )

    w00 = (1 - wx) * (1 - wy) * valid(x0, y0)
    w01 = wx * (1 - wy) * valid(x0 + 1, y0)
    w10 = (1 - wx) * wy * valid(x0, y0 + 1)
    w11 = wx * wy * valid(x0 + 1, y0 + 1)

    # slab-relative coordinates (independent per-tap clipping, see
    # _kernel)
    base = b * H - ymin_ref[t]
    r_top = jnp.clip(jnp.clip(y0, 0, H - 1) + base, 0, S - 1)
    r_bot = jnp.clip(jnp.clip(y0 + 1, 0, H - 1) + base, 0, S - 1)
    c0 = jnp.clip(jnp.clip(x0, 0, W - 1) - xmin_ref[t], 0, 3 * TILE_W - 1)
    c1 = jnp.clip(jnp.clip(x0 + 1, 0, W - 1) - xmin_ref[t], 0, 3 * TILE_W - 1)

    def page_coords(c):
        page1 = (c >= TILE_W) & (c < 2 * TILE_W)
        page2 = c >= 2 * TILE_W
        cp = jnp.where(page1, c - TILE_W,
                       jnp.where(page2, c - 2 * TILE_W, c))
        return page1, page2, jnp.clip(cp, 0, TILE_W - 1)

    p1_0, p2_0, cp0 = page_coords(c0)
    p1_1, p2_1, cp1 = page_coords(c1)

    slab_dma(t % 2, t).wait()
    slot = t % 2

    iota_i = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    t_top = r_top - iota_i                      # [-7, S-1]
    t_bot = r_bot - iota_i
    u_lo = jnp.min(t_top)
    n_u = jnp.max(t_bot) - u_lo + 1             # dynamic trip count

    def body(u, accs):
        start = u_lo + u
        # shared per-row work (hoisted out of the channel loop):
        # combined per-column-tap weights for this span row
        top = (t_top == start).astype(jnp.float32)
        bot = (t_bot == start).astype(jnp.float32)
        wt0 = top * w00 + bot * w10
        wt1 = top * w01 + bot * w11
        # 16-row window holding every in-range slab row start..start+7;
        # start-qb*8 in [-7, 15] at the clip edges — wrapped reads are
        # garbage but can never satisfy the row-match (docstring)
        qb = jnp.clip(start // TILE_H, 0, S // TILE_H - 2)
        q8 = pl.multiple_of(qb * TILE_H, TILE_H)
        shift = (qb * TILE_H - start) % (2 * TILE_H)

        new = []
        for ch in range(C):
            win = slab_ref[slot, ch, pl.ds(q8, 2 * TILE_H)]
            rolled = pltpu.roll(win, shift, 0)[:TILE_H]
            rows_a = rolled[:, :TILE_W]
            rows_b = rolled[:, TILE_W : 2 * TILE_W]
            rows_c = rolled[:, 2 * TILE_W :]

            def gather3(p1, p2, cp):
                g = jnp.take_along_axis(rows_a, cp, axis=1)
                g = jnp.where(
                    p1, jnp.take_along_axis(rows_b, cp, axis=1), g
                )
                return jnp.where(
                    p2, jnp.take_along_axis(rows_c, cp, axis=1), g
                )

            g0 = gather3(p1_0, p2_0, cp0)
            g1 = gather3(p1_1, p2_1, cp1)
            new.append(accs[ch] + wt0 * g0 + wt1 * g1)
        return tuple(new)

    accs = jax.lax.fori_loop(
        0, n_u, body,
        tuple(jnp.zeros((TILE_H, TILE_W), jnp.float32) for _ in range(C)),
    )
    for ch in range(C):
        out_ref[ch] = accs[ch].astype(out_ref.dtype)


def _kernel_blend(ymin0_ref, xmin0_ref, ymin1_ref, xmin1_ref,
                  img0_ref, img1_ref, flow_ref, out_ref, slab_ref, acc_ref,
                  sem, *, H, W, C, S, n_tw):
    """Fused dual-warp + occlusion blend.

    Computes out = occ * warp(img0, flow0) + (1-occ) * warp(img1, flow1)
    for one 8x128 output tile: one slab DMA per source image (double
    buffered), both warps' gather-accumulations run into a VMEM scratch
    (raw sums, so the blend multiplies the SUM exactly like the unfused
    XLA blend), then a single blended output stream is written. Saves
    one output stream + the separate blend pass + the layout copies
    around them versus two flow_warp calls (VERDICT round-1 item 1).

    flow_ref packs [fx0, fy0, fx1, fy1, occ] as 5 PLANES (leading dim
    of a [5, B*H, W] operand — channels-last packing would put the 5 in
    the lane dim and pad every tile 25.6x).
    """
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    th = t // n_tw
    tw = t % n_tw

    def slab_dma(img, slot, ymin_ref, xmin_ref, tile):
        img_ref_ = img0_ref if img == 0 else img1_ref
        return pltpu.make_async_copy(
            img_ref_.at[
                :,
                pl.ds(pl.multiple_of(ymin_ref[tile], TILE_H), S),
                pl.ds(pl.multiple_of(xmin_ref[tile], TILE_W), 3 * TILE_W),
            ],
            slab_ref.at[slot, img],
            sem.at[slot, img],
        )

    @pl.when(t == 0)
    def _():
        slab_dma(0, 0, ymin0_ref, xmin0_ref, 0).start()
        slab_dma(1, 0, ymin1_ref, xmin1_ref, 0).start()

    @pl.when(t + 1 < n_t)
    def _():
        slab_dma(0, (t + 1) % 2, ymin0_ref, xmin0_ref, t + 1).start()
        slab_dma(1, (t + 1) % 2, ymin1_ref, xmin1_ref, t + 1).start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    gr = th * TILE_H + rows                     # global output row (B*H space)
    b = gr // H
    y_img = gr - b * H
    x = cols + tw * TILE_W
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    slot = t % 2

    def accumulate(img, fx, fy, ymin_t, xmin_t):
        """Gather-accumulate one warp's raw 4-tap sums into acc_ref[img]."""
        sx = x.astype(jnp.float32) + fx
        sy = y_img.astype(jnp.float32) + fy
        x0f = jnp.floor(sx)
        y0f = jnp.floor(sy)
        wx = sx - x0f
        wy = sy - y0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)

        def valid(xi, yi):
            return (
                (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            ).astype(jnp.float32)

        w00 = (1 - wx) * (1 - wy) * valid(x0, y0)
        w01 = wx * (1 - wy) * valid(x0 + 1, y0)
        w10 = (1 - wx) * wy * valid(x0, y0 + 1)
        w11 = wx * wy * valid(x0 + 1, y0 + 1)

        # slab-relative coords; each tap clipped INDEPENDENTLY (see _kernel)
        base = b * H - ymin_t
        r_top = jnp.clip(jnp.clip(y0, 0, H - 1) + base, 0, S - 1)
        r_bot = jnp.clip(jnp.clip(y0 + 1, 0, H - 1) + base, 0, S - 1)
        c0 = jnp.clip(jnp.clip(x0, 0, W - 1) - xmin_t, 0, 3 * TILE_W - 1)
        c1 = jnp.clip(jnp.clip(x0 + 1, 0, W - 1) - xmin_t, 0, 3 * TILE_W - 1)

        def page_coords(c):
            page1 = (c >= TILE_W) & (c < 2 * TILE_W)
            page2 = c >= 2 * TILE_W
            cp = jnp.where(page1, c - TILE_W,
                           jnp.where(page2, c - 2 * TILE_W, c))
            return page1, page2, jnp.clip(cp, 0, TILE_W - 1)

        p1_0, p2_0, cp0 = page_coords(c0)
        p1_1, p2_1, cp1 = page_coords(c1)

        # windowed span loop (v3 inner — see _kernel_v3): dynamic trip
        # over the tile's actual row spread, 16-row window loads
        # instead of whole-slab rolls, per-row weight folding
        t_top = r_top - iota_i
        t_bot = r_bot - iota_i
        u_lo = jnp.min(t_top)
        n_u = jnp.max(t_bot) - u_lo + 1

        def span_body(u, accs):
            start = u_lo + u
            top = (t_top == start).astype(jnp.float32)
            bot = (t_bot == start).astype(jnp.float32)
            wt0 = top * w00 + bot * w10
            wt1 = top * w01 + bot * w11
            qb = jnp.clip(start // TILE_H, 0, S // TILE_H - 2)
            q8 = pl.multiple_of(qb * TILE_H, TILE_H)
            shift = (qb * TILE_H - start) % (2 * TILE_H)
            new = []
            for ch in range(C):
                win = slab_ref[slot, img, ch, pl.ds(q8, 2 * TILE_H)]
                rolled = pltpu.roll(win, shift, 0)[:TILE_H]
                rows_a = rolled[:, :TILE_W]
                rows_b = rolled[:, TILE_W : 2 * TILE_W]
                rows_c = rolled[:, 2 * TILE_W :]

                def gather3(p1, p2, cp):
                    g = jnp.take_along_axis(rows_a, cp, axis=1)
                    g = jnp.where(
                        p1, jnp.take_along_axis(rows_b, cp, axis=1), g
                    )
                    return jnp.where(
                        p2, jnp.take_along_axis(rows_c, cp, axis=1), g
                    )

                g0 = gather3(p1_0, p2_0, cp0)
                g1 = gather3(p1_1, p2_1, cp1)
                new.append(accs[ch] + wt0 * g0 + wt1 * g1)
            return tuple(new)

        accs = jax.lax.fori_loop(
            0, n_u, span_body,
            tuple(jnp.zeros((TILE_H, TILE_W), jnp.float32)
                  for _ in range(C)),
        )
        for ch in range(C):
            acc_ref[img, ch] = accs[ch]

    slab_dma(0, slot, ymin0_ref, xmin0_ref, t).wait()
    accumulate(0, flow_ref[0], flow_ref[1], ymin0_ref[t], xmin0_ref[t])
    slab_dma(1, slot, ymin1_ref, xmin1_ref, t).wait()
    accumulate(1, flow_ref[2], flow_ref[3], ymin1_ref[t], xmin1_ref[t])

    occ = flow_ref[4]
    for ch in range(C):
        out_ref[ch] = (
            occ * acc_ref[0, ch] + (1 - occ) * acc_ref[1, ch]
        ).astype(out_ref.dtype)


def _kernel_nhwc(ymin_ref, lmin_ref, img_ref, fx_ref, fy_ref, out_ref,
                 slab_ref, sem, *, H, W, C, S, P, n_tl):
    """NHWC-native tile-slab warp.

    The image lives as [B*H, W*C] (a FREE reshape of NHWC — W and C are
    adjacent minor dims), so output tiles are native (8, 128) lane
    tiles, the gather index space is the merged lane axis l = x*C + ch,
    and no CHW transpose exists anywhere. The source slab is
    (S, P*128) f32 DMA'd at the per-tile (8,128)-aligned minimum
    (scalar-prefetched); flows arrive as channel-broadcast [B*H, W*C]
    planes so flow tiles align with output tiles.
    """
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    th = t // n_tl
    tl = t % n_tl

    def slab_dma(slot, tile):
        return pltpu.make_async_copy(
            img_ref.at[
                pl.ds(pl.multiple_of(ymin_ref[tile], TILE_H), S),
                pl.ds(pl.multiple_of(lmin_ref[tile], TILE_W), P * TILE_W),
            ],
            slab_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(t == 0)
    def _():
        slab_dma(0, 0).start()

    @pl.when(t + 1 < n_t)
    def _():
        slab_dma((t + 1) % 2, t + 1).start()

    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    g_lane = tl * TILE_W + lanes            # global lane in [0, W*C)
    x = g_lane // C                         # source pixel column
    ch = g_lane - x * C                     # channel within pixel
    gr = th * TILE_H + rows                 # global output row (B*H space)
    b = gr // H
    y_img = gr - b * H

    sx = x.astype(jnp.float32) + fx_ref[...]
    sy = y_img.astype(jnp.float32) + fy_ref[...]
    x0f = jnp.floor(sx)
    y0f = jnp.floor(sy)
    wx = sx - x0f
    wy = sy - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def valid(xi, yi):
        return ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)).astype(
            jnp.float32
        )

    w00 = (1 - wx) * (1 - wy) * valid(x0, y0)
    w01 = wx * (1 - wy) * valid(x0 + 1, y0)
    w10 = (1 - wx) * wy * valid(x0, y0 + 1)
    w11 = wx * wy * valid(x0 + 1, y0 + 1)

    # slab-relative coordinates; each tap clipped INDEPENDENTLY (see
    # _kernel). Lane index of tap (xi, ch) is xi*C + ch.
    base = b * H - ymin_ref[t]
    r_top = jnp.clip(jnp.clip(y0, 0, H - 1) + base, 0, S - 1)
    r_bot = jnp.clip(jnp.clip(y0 + 1, 0, H - 1) + base, 0, S - 1)
    l0 = jnp.clip(
        jnp.clip(x0, 0, W - 1) * C + ch - lmin_ref[t], 0, P * TILE_W - 1
    )
    l1 = jnp.clip(
        jnp.clip(x0 + 1, 0, W - 1) * C + ch - lmin_ref[t], 0, P * TILE_W - 1
    )
    page0 = l0 // TILE_W
    page1 = l1 // TILE_W
    cp0 = l0 - page0 * TILE_W
    cp1 = l1 - page1 * TILE_W

    slab_dma(t % 2, t).wait()
    slot = t % 2

    iota_i = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    r_lo = jnp.min(r_top)
    r_hi = jnp.max(r_bot)
    out_ref[...] = jnp.zeros((TILE_H, TILE_W), out_ref.dtype)
    for q in range(S // TILE_H):
        @pl.when((q * TILE_H <= r_hi) & (r_lo < (q + 1) * TILE_H))
        def _(q=q):
            acc = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            blk = slab_ref[slot, q * TILE_H : (q + 1) * TILE_H, :]
            pages = [blk[:, p * TILE_W : (p + 1) * TILE_W] for p in range(P)]
            for d in range(TILE_H):
                # roll(x, n-d)[i] == x[(i+d) % n]
                shift = (TILE_H - d) % TILE_H
                rp = [pltpu.roll(pg, shift, 0) if d else pg for pg in pages]
                srow = q * TILE_H + (iota_i + d) % TILE_H

                def gatherP(page, cp):
                    g = jnp.take_along_axis(rp[0], cp, axis=1)
                    for p in range(1, P):
                        g = jnp.where(
                            page == p,
                            jnp.take_along_axis(rp[p], cp, axis=1),
                            g,
                        )
                    return g

                g0 = gatherP(page0, cp0)
                g1 = gatherP(page1, cp1)
                top = (r_top == srow).astype(jnp.float32)
                bot = (r_bot == srow).astype(jnp.float32)
                acc = acc + top * (w00 * g0 + w01 * g1)
                acc = acc + bot * (w10 * g0 + w11 * g1)
            out_ref[...] += acc.astype(out_ref.dtype)


def _pallas_path_nhwc(img_lanes, fx3, fy3, ymin_blk, lmin_blk, *,
                      H, W, C, S, P, B, interpret=False):
    BH = B * H
    WC = W * C
    n_th, n_tl = BH // TILE_H, WC // TILE_W
    kernel = functools.partial(
        _kernel_nhwc, H=H, W=W, C=C, S=S, P=P, n_tl=n_tl
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ymin_blk, lmin_blk
        grid=(n_th * n_tl,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # img stays in HBM
            pl.BlockSpec(
                (TILE_H, TILE_W),
                lambda t, ymin, lmin: (t // n_tl, t % n_tl),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_H, TILE_W),
                lambda t, ymin, lmin: (t // n_tl, t % n_tl),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (TILE_H, TILE_W),
            lambda t, ymin, lmin: (t // n_tl, t % n_tl),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, S, P * TILE_W), jnp.float32),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, WC), jnp.float32),
        interpret=interpret,
    )(ymin_blk, lmin_blk, img_lanes, fx3, fy3)


def flow_warp_tiled_nhwc(feature: jnp.ndarray, flow: jnp.ndarray,
                         slab_rows: int = 64, pages: int = 4,
                         interpret: bool = False) -> jnp.ndarray:
    """Exact flow_warp via the NHWC-native tile-slab kernel.

    feature: [B, H, W, C]; flow: [B, H, W, 2] (x, y). Requires
    (B*H) % 8 == 0 and (W*C) % 128 == 0 with W*C >= pages*128; falls
    back to the XLA gather otherwise, or (via lax.cond) whenever any
    tile's flow spread exceeds the slab extents — ALWAYS exact.

    NOTE: non-default experimental variant (see resolve_warp_impl) —
    measured net-slower than the CHW kernel at model level. Known
    inefficiency kept for simplicity: per-tile extents are reduced
    over [B*H, W*C] lane arrays (C x larger than the flow), and the
    channel-broadcast flow planes appear both in the extent pass and
    the fast branch (XLA may or may not CSE across the cond).
    """
    B, H, W, C = feature.shape
    S, P = slab_rows, pages
    BH, WC = B * H, W * C
    if BH % TILE_H or WC % TILE_W or WC < P * TILE_W or BH < S:
        return warp_xla.flow_warp(feature, flow)

    n_th, n_tl = BH // TILE_H, WC // TILE_W

    # per-tile source extents in (B*H row, W*C lane) space
    flow_f = flow.astype(jnp.float32)
    lane_x = jnp.asarray(np.arange(WC, dtype=np.int32) // C)[None]  # [1, WC]
    lane_ch = jnp.asarray(np.arange(WC, dtype=np.int32) % C)[None]
    fx3 = jnp.broadcast_to(
        flow_f[..., 0:1], (B, H, W, C)
    ).reshape(BH, WC)
    fy3 = jnp.broadcast_to(
        flow_f[..., 1:2], (B, H, W, C)
    ).reshape(BH, WC)
    x0 = jnp.floor(lane_x.astype(jnp.float32) + fx3).astype(jnp.int32)
    row_y = jnp.asarray(np.arange(BH, dtype=np.int32) % H)[:, None]
    row_b = jnp.asarray(
        (np.arange(BH, dtype=np.int32) // H) * H
    )[:, None]
    y0 = jnp.floor(row_y.astype(jnp.float32) + fy3).astype(jnp.int32)
    l_top = jnp.clip(x0, 0, W - 1) * C + lane_ch
    l_bot = jnp.clip(x0 + 1, 0, W - 1) * C + lane_ch
    r_top = jnp.clip(y0, 0, H - 1) + row_b
    r_bot = jnp.clip(y0 + 1, 0, H - 1) + row_b

    def tile_reduce(v, fn):
        return fn(v.reshape(n_th, TILE_H, n_tl, TILE_W), axis=(1, 3))

    lmin = tile_reduce(l_top, jnp.min)
    lmax = tile_reduce(l_bot, jnp.max)
    rmin = tile_reduce(r_top, jnp.min)
    rmax = tile_reduce(r_bot, jnp.max)
    ymin_blk = (jnp.clip(rmin, 0, BH - S) // TILE_H) * TILE_H
    lmin_blk = (jnp.clip(lmin, 0, WC - P * TILE_W) // TILE_W) * TILE_W
    ok = jnp.all(rmax - ymin_blk <= S - 1) & jnp.all(
        lmax - lmin_blk <= P * TILE_W - 1
    )

    dtype = feature.dtype

    def fast(args):
        feature, flow_f, ymin_blk, lmin_blk = args
        img = feature.astype(jnp.float32).reshape(BH, WC)  # free reshape
        fx3 = jnp.broadcast_to(flow_f[..., 0:1], (B, H, W, C)).reshape(BH, WC)
        fy3 = jnp.broadcast_to(flow_f[..., 1:2], (B, H, W, C)).reshape(BH, WC)
        out = _pallas_path_nhwc(
            img, fx3, fy3, ymin_blk.reshape(-1), lmin_blk.reshape(-1),
            H=H, W=W, C=C, S=S, P=P, B=B, interpret=interpret,
        )
        return out.reshape(B, H, W, C).astype(dtype)

    def slow(args):
        feature, flow_f, _, _ = args
        return warp_xla.flow_warp(feature, flow_f).astype(dtype)

    return jax.lax.cond(
        ok, fast, slow, (feature, flow_f, ymin_blk, lmin_blk)
    )


def _inner_for(kernel: str) -> str:
    """Kernel-string -> inner-loop flavor ('scan' v1 | 'span' v2 |
    'win' v3)."""
    if kernel.startswith("chw_v3"):
        return "win"
    if kernel.startswith("chw_v2"):
        return "span"
    return "scan"


def resolve_warp_impl(impl: str, channels: int) -> Tuple[str, bool]:
    """-> (kernel, interpret) where kernel is 'nhwc' | 'chw' | 'xla'.

    'auto' uses the CHW tile-slab kernel on TPU for narrow tensors
    (images, flows, shallow features); wide feature maps keep the XLA
    gather. The NHWC-lane-space variant ('tiled_nhwc') avoids the CHW
    transposes but pays 3x per-lane weight math and an extra gather
    page — measured net-slower at model level (244 vs 218 ms @1080p).
    'auto' resolves to the windowed span-loop v3 flavor ('chw_v3'):
    the 2026-08-20 v5e A/B (scripts/tpu_warp_v2_ab.py) measured
    standalone 4K C=3 15.98 ms/warp (v3) vs 21.15 (v1) / 27.06 (v2)
    at mag-4 flows, 28.3 vs 56.5 (v2) at mag-12 unchecked, bit-exact
    vs the XLA gather on device (max|d| = 0.0), and lite-4K in-model
    372.6 ms/frame vs 381.2 with v2. (History: 'auto' was v2 in round
    3 — v2 beat v1 in-model 544 vs 559 — and v3 strictly dominates
    both.) Forcing a tiled kernel off-TPU runs it in interpret mode
    (CPU tests).
    """
    if impl in ("tiled", "tiled_chw"):
        return "chw", jax.default_backend() != "tpu"
    if impl == "tiled_unchecked":
        # serving mode: skip the per-call exactness cond (see
        # flow_warp_tiled unchecked=True) — cfg.fast() plumbs this
        return "chw_unchecked", jax.default_backend() != "tpu"
    if impl == "tiled_v2":
        return "chw_v2", jax.default_backend() != "tpu"
    if impl == "tiled_v2_unchecked":
        return "chw_v2_unchecked", jax.default_backend() != "tpu"
    if impl == "tiled_v3":
        return "chw_v3", jax.default_backend() != "tpu"
    if impl == "tiled_v3_unchecked":
        return "chw_v3_unchecked", jax.default_backend() != "tpu"
    if impl == "tiled_nhwc":
        return "nhwc", jax.default_backend() != "tpu"
    if impl == "xla":
        return "xla", False
    if jax.default_backend() == "tpu" and channels <= 4:
        return "chw_v3", False
    return "xla", False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _tiled_warp(feature, flow, kernel: str, interpret: bool):
    if kernel == "nhwc":
        return flow_warp_tiled_nhwc(feature, flow, interpret=interpret)
    return flow_warp_tiled(feature, flow, interpret=interpret,
                           unchecked=kernel.endswith("unchecked"),
                           inner=_inner_for(kernel))


def _tiled_warp_fwd(feature, flow, kernel, interpret):
    return _tiled_warp(feature, flow, kernel, interpret), (feature, flow)


def _tiled_warp_bwd(kernel, interpret, res, g):
    # the kernels are bit-exact with the XLA warp, so the XLA VJP is
    # the true gradient (training runs the fast forward either way)
    feature, flow = res
    _, vjp = jax.vjp(warp_xla.flow_warp, feature, flow)
    return vjp(g)


_tiled_warp.defvjp(_tiled_warp_fwd, _tiled_warp_bwd)


def flow_warp_dispatch(feature: jnp.ndarray, flow: jnp.ndarray,
                       impl: str = "auto") -> jnp.ndarray:
    kernel, interpret = resolve_warp_impl(impl, feature.shape[-1])
    if kernel == "xla":
        return warp_xla.flow_warp(feature, flow)
    return _tiled_warp(feature, flow, kernel, interpret)


def _tile_minmax(v, n_th, n_tw):
    v = v.reshape(n_th, TILE_H, n_tw, TILE_W)
    return v.min(axis=(1, 3)), v.max(axis=(1, 3))


def _pallas_path(img_chw, flow, ymin_blk, xmin_blk, *, H, W, C, S, B, dtype,
                 interpret=False, inner="scan", BH_out=None):
    """BH_out (spatial serving): emit only BH_out output rows while the
    SOURCE image keeps its full B*H rows — the caller folds the global
    row offset into the flow's y component, so the kernel's local
    output rows sample global source coordinates. Requires B == 1
    upstream (the kernel's batch decode gr // H must stay 0)."""
    BH = B * H
    if BH_out is None:
        BH_out = BH
    n_th, n_tw = BH_out // TILE_H, W // TILE_W
    n_t = n_th * n_tw
    kernel = functools.partial(
        {"win": _kernel_v3, "span": _kernel_v2}.get(inner, _kernel),
        H=H, W=W, C=C, S=S, n_tw=n_tw, dtype=dtype
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ymin_blk (8-row units), xmin_blk (pages)
        grid=(n_t,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # img stays in HBM
            pl.BlockSpec(  # planar [2, BH, W] flow: padding-free tiles
                (2, TILE_H, TILE_W),
                lambda t, ymin, xmin: (0, t // n_tw, t % n_tw),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (C, TILE_H, TILE_W),
            lambda t, ymin, xmin: (0, t // n_tw, t % n_tw),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, C, S, 3 * TILE_W), jnp.float32),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, BH_out, W), dtype),
        interpret=interpret,
    )(ymin_blk, xmin_blk, img_chw, flow)
    return out


def _slab_extents(flow: jnp.ndarray, B: int, H: int, W: int, S: int):
    """Per-tile slab origins + in-budget flag for the CHW tile-slab kernel.

    flow: [B, H, W, 2] (x, y). Returns (ymin_blk, xmin_blk, ok) where the
    origins are (8, 128)-aligned [n_th, n_tw] int32 grids in (B*H row,
    col) space and `ok` is True iff every tile's 4-tap source extent
    fits an (S x 384) slab anchored there.

    Computed PER COMPONENT on [B, H, W] arrays: the earlier stacked
    form materialized a [1, H, W, 2] meshgrid CONSTANT plus s32
    intermediates whose channels-last 2-vector lands in the lane dim
    under the default layout — 64x tile padding, 3.98 GB for the
    constant alone at 4K (it OOM'd the fast-profile graph and sat in
    every checked-warp graph as a global allocation). broadcasted_iota
    generates, XLA fuses, nothing [.., 2]-shaped is ever stored.
    """
    BH = B * H
    n_th, n_tw = BH // TILE_H, W // TILE_W
    fx = flow[..., 0].astype(jnp.float32)  # [B, H, W]
    fy = flow[..., 1].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    row = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    x0 = jnp.floor(col + fx).astype(jnp.int32)  # top-left taps
    y0 = jnp.floor(row + fy).astype(jnp.int32)
    boff = (jnp.arange(B, dtype=jnp.int32) * H)[:, None, None]
    # independently-clipped top/bottom taps, in (B*H row, col) space
    xmin_t = jnp.clip(x0, 0, W - 1)
    xmax_t = jnp.clip(x0 + 1, 0, W - 1)
    ymin_t = jnp.clip(y0, 0, H - 1) + boff
    ymax_t = jnp.clip(y0 + 1, 0, H - 1) + boff

    def per_tile(a, op):
        return op(a.reshape(n_th, TILE_H, n_tw, TILE_W), axis=(1, 3))

    # DMA origins must be (8, 128)-aligned; 3 column pages keep >= 255
    # columns of budget after alignment waste
    ymin_blk = (jnp.clip(per_tile(ymin_t, jnp.min), 0, BH - S)
                // TILE_H) * TILE_H
    xmin_blk = (jnp.clip(per_tile(xmin_t, jnp.min), 0, W - 3 * TILE_W)
                // TILE_W) * TILE_W
    ok_y = jnp.all(per_tile(ymax_t, jnp.max) - ymin_blk <= S - 1)
    ok_x = jnp.all(per_tile(xmax_t, jnp.max) - xmin_blk <= 3 * TILE_W - 1)
    return ymin_blk, xmin_blk, ok_y & ok_x


def flow_warp_tiled(feature: jnp.ndarray, flow: jnp.ndarray,
                    slab_rows: int = 64, interpret: bool = False,
                    unchecked: bool = False,
                    inner: str = "scan",
                    planar_out: bool = False) -> jnp.ndarray:
    """Exact flow_warp (ops.warp semantics) via the tile-slab kernel.

    feature: [B, H, W, C]; flow: [B, H, W, 2] (x, y). Requires
    H % 8 == 0, W % 128 == 0 and W >= 256; otherwise (or when any
    tile's flow spread exceeds the slab) the XLA path runs instead.

    planar_out=True returns the kernel's native planar [C, B*H, W] f32
    (no exit transpose) — the planar full-res tail consumes warped
    images in this layout (refiner proj plane inputs, planar blends).
    """
    B, H, W, C = feature.shape
    S = slab_rows
    if H % TILE_H or W % TILE_W or W < 3 * TILE_W or H < S:
        out = warp_xla.flow_warp(feature, flow)
        if planar_out:
            return out.astype(jnp.float32).reshape(
                B * H, W, C
            ).transpose(2, 0, 1)
        return out

    BH = B * H
    n_th, n_tw = BH // TILE_H, W // TILE_W

    # per-tile source extents + slab origins, computed channel-paired
    # in NHWC to minimize layout churn; cond operands stay small (the
    # f32 CHW transpose of the image happens inside the fast branch)
    ymin_blk, xmin_blk, ok = _slab_extents(flow, B, H, W, S)

    dtype = feature.dtype
    # CHW transposes hoisted OUTSIDE the cond: conditional operands and
    # results then carry clean [C, BH, W] f32 layouts instead of the
    # T(4,128)-tiled C=3 NHWC form, which made XLA's conditional
    # boundary copies a measurable cost (~6 ms/warp at 4K)
    img_chw = feature.astype(jnp.float32).reshape(BH, W, C).transpose(2, 0, 1)
    # planar [2, BH, W] flow operand: the [BH, W, 2] form's default
    # custom-call layout puts the 2-vector in lanes — 64x tile padding
    # in HBM and in the kernel's VMEM flow blocks
    flow_f = flow.astype(jnp.float32).reshape(BH, W, 2).transpose(2, 0, 1)

    def fast(args):
        img_chw, flow_f, ymin_blk, xmin_blk = args
        return _pallas_path(
            img_chw, flow_f, ymin_blk.reshape(-1), xmin_blk.reshape(-1),
            H=H, W=W, C=C, S=S, B=B, dtype=jnp.float32,
            interpret=interpret, inner=inner,
        )

    def slow(args):
        # rare path (extreme flow spread): exact XLA gather, reshaped
        # to match the fast branch's planar result layout
        img_chw, flow_f, _, _ = args
        feat = img_chw.transpose(1, 2, 0).reshape(B, H, W, C)
        f = flow_f.transpose(1, 2, 0).reshape(B, H, W, 2)
        out = warp_xla.flow_warp(feat, f)
        return out.reshape(BH, W, C).transpose(2, 0, 1)

    if unchecked:
        # serving mode: skip the exactness cond — taps beyond the slab
        # clamp to its edge (only reachable when per-tile flow spread
        # exceeds S-1 rows / 383 cols, i.e. pathological flows)
        out = fast((img_chw, flow_f, ymin_blk, xmin_blk))
    else:
        out = jax.lax.cond(
            ok, fast, slow, (img_chw, flow_f, ymin_blk, xmin_blk)
        )
    if planar_out:
        return out  # [C, B*H, W] f32, the kernel's native layout
    return out.transpose(1, 2, 0).reshape(B, H, W, C).astype(dtype)


# ----------------------------------------------------------------------
# planar (CHW) warp path — the full-res tail keeps images in the warp
# kernel's native [C, B*H, W] layout so no NHWC<->planar transposes
# exist between the pre-align warp, the decoder blend warps, and the
# refiner's plane-consuming proj conv (ops/conv_pallas.py planes op).
# ----------------------------------------------------------------------

def nhwc_to_planar(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [C, B*H, W] f32 (the tile-slab kernel's image
    layout)."""
    B, H, W, C = x.shape
    return x.astype(jnp.float32).reshape(B * H, W, C).transpose(2, 0, 1)


def planar_to_nhwc(p: jnp.ndarray, B: int, dtype=None) -> jnp.ndarray:
    C, BH, W = p.shape
    out = p.transpose(1, 2, 0).reshape(B, BH // B, W, C)
    return out if dtype is None else out.astype(dtype)


def flow_warp_tiled_planar(img_chw: jnp.ndarray, flow: jnp.ndarray,
                           B: int, slab_rows: int = 64,
                           interpret: bool = False,
                           unchecked: bool = False,
                           inner: str = "scan") -> jnp.ndarray:
    """Planar-in planar-out tile-slab warp (exact; XLA fallback).

    img_chw: [C, B*H, W] f32; flow: [B, H, W, 2]. Same applicability
    and exactness rules as flow_warp_tiled.
    """
    C, BH, W = img_chw.shape
    H = BH // B
    S = slab_rows

    def xla_planar(img_chw, flow):
        feat = img_chw.transpose(1, 2, 0).reshape(B, H, W, C)
        out = warp_xla.flow_warp(feat, flow.astype(jnp.float32))
        return out.reshape(BH, W, C).transpose(2, 0, 1)

    if H % TILE_H or W % TILE_W or W < 3 * TILE_W or H < S:
        return xla_planar(img_chw, flow)

    ymin_blk, xmin_blk, ok = _slab_extents(flow, B, H, W, S)
    flow_f = flow.astype(jnp.float32).reshape(BH, W, 2).transpose(2, 0, 1)

    def fast(args):
        img_chw, flow_f, ymin_blk, xmin_blk = args
        return _pallas_path(
            img_chw, flow_f, ymin_blk.reshape(-1), xmin_blk.reshape(-1),
            H=H, W=W, C=C, S=S, B=B, dtype=jnp.float32,
            interpret=interpret, inner=inner,
        )

    def slow(args):
        img_chw, flow_f, _, _ = args
        return xla_planar(
            img_chw, flow_f.transpose(1, 2, 0).reshape(B, H, W, 2))

    args = (img_chw, flow_f, ymin_blk, xmin_blk)
    if unchecked:
        return fast(args)
    return jax.lax.cond(ok, fast, slow, args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def planar_warp_op(img_chw, flow, B: int, kernel: str, interpret: bool):
    """Differentiable planar warp; kernel as from resolve_warp_impl
    ('chw', 'chw_unchecked', 'chw_v2', 'chw_v2_unchecked', 'xla')."""
    if kernel == "xla":
        C, BH, W = img_chw.shape
        H = BH // B
        feat = img_chw.transpose(1, 2, 0).reshape(B, H, W, C)
        out = warp_xla.flow_warp(feat, flow.astype(jnp.float32))
        return out.reshape(BH, W, C).transpose(2, 0, 1)
    return flow_warp_tiled_planar(
        img_chw, flow, B, interpret=interpret,
        unchecked=kernel.endswith("unchecked"),
        inner=_inner_for(kernel),
    )


def _planar_ref(img_chw, flow, B):
    C, BH, W = img_chw.shape
    H = BH // B
    feat = img_chw.transpose(1, 2, 0).reshape(B, H, W, C)
    out = warp_xla.flow_warp(feat, flow.astype(jnp.float32))
    return out.reshape(BH, W, C).transpose(2, 0, 1)


def _planar_warp_fwd(img_chw, flow, B, kernel, interpret):
    return planar_warp_op(img_chw, flow, B, kernel, interpret), (
        img_chw, flow,
    )


def _planar_warp_bwd(B, kernel, interpret, res, g):
    img_chw, flow = res
    _, vjp = jax.vjp(lambda i, f: _planar_ref(i, f, B), img_chw, flow)
    return vjp(g)


planar_warp_op.defvjp(_planar_warp_fwd, _planar_warp_bwd)


def flow_warp_planar_dispatch(img_chw: jnp.ndarray, flow: jnp.ndarray,
                              B: int, impl: str = "auto") -> jnp.ndarray:
    kernel, interpret = resolve_warp_impl(impl, img_chw.shape[0])
    return planar_warp_op(img_chw, flow, B, kernel, interpret)


# ----------------------------------------------------------------------
# pair ops: two same-shape warps under ONE exactness cond
#
# Every blend site and pyramid pre-align warps (im0, flow0) and
# (im1, flow1) at the same shape back-to-back. With per-call conds each
# warp pays its own `conditional` boundary (round-2 lite-4K trace: the
# cond bucket was 98 ms, ~60% of the warp kernels themselves — VERDICT
# r2 item 6). The pair op computes each flow's slab extents once,
# reduces both `ok`s into one scalar, and runs BOTH tile-slab kernels
# inside a single cond — halving the conditional count and boundary
# crossings without touching exactness (the slow branch composes both
# XLA gathers, as before).
# ----------------------------------------------------------------------

def _pair_core(img0_chw, img1_chw, flow0, flow1, *, B, H, W, C, S,
               interpret, unchecked, inner):
    """Two planar warps, one cond. imgs [C, B*H, W] f32; flows
    [B, H, W, 2]. Returns (out0, out1) planar f32."""
    BH = B * H
    ymin0, xmin0, ok0 = _slab_extents(flow0, B, H, W, S)
    ymin1, xmin1, ok1 = _slab_extents(flow1, B, H, W, S)
    ok = ok0 & ok1
    f0 = flow0.astype(jnp.float32).reshape(BH, W, 2).transpose(2, 0, 1)
    f1 = flow1.astype(jnp.float32).reshape(BH, W, 2).transpose(2, 0, 1)

    def one(img, f, ymin, xmin):
        return _pallas_path(
            img, f, ymin.reshape(-1), xmin.reshape(-1),
            H=H, W=W, C=C, S=S, B=B, dtype=jnp.float32,
            interpret=interpret, inner=inner,
        )

    def fast(args):
        i0, i1, f0, f1, y0, x0, y1, x1 = args
        return one(i0, f0, y0, x0), one(i1, f1, y1, x1)

    def slow(args):
        i0, i1, f0, f1, *_ = args

        def xla_planar(img, f):
            feat = img.transpose(1, 2, 0).reshape(B, H, W, C)
            fn = f.transpose(1, 2, 0).reshape(B, H, W, 2)
            out = warp_xla.flow_warp(feat, fn)
            return out.reshape(BH, W, C).transpose(2, 0, 1)

        return xla_planar(i0, f0), xla_planar(i1, f1)

    args = (img0_chw, img1_chw, f0, f1, ymin0, xmin0, ymin1, xmin1)
    if unchecked:
        return fast(args)
    return jax.lax.cond(ok, fast, slow, args)


def _pair_xla(im0, im1, flow0, flow1):
    return warp_xla.flow_warp(im0, flow0), warp_xla.flow_warp(im1, flow1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def warp_pair_op(im0, im1, flow0, flow1, kernel: str, interpret: bool):
    """(warp(im0, flow0), warp(im1, flow1)) NHWC, one exactness cond.

    kernel as from resolve_warp_impl. Shapes of im0/im1 and
    flow0/flow1 must match; same applicability rules as
    flow_warp_tiled (shape-ineligible -> two XLA warps, no cond).
    """
    if kernel == "xla":
        return _pair_xla(im0, im1, flow0, flow1)
    if kernel == "nhwc":  # experimental variant has no pair form
        return (flow_warp_tiled_nhwc(im0, flow0, interpret=interpret),
                flow_warp_tiled_nhwc(im1, flow1, interpret=interpret))
    B, H, W, C = im0.shape
    S = 64
    if H % TILE_H or W % TILE_W or W < 3 * TILE_W or H < S:
        return _pair_xla(im0, im1, flow0, flow1)
    BH = B * H
    dtype = im0.dtype
    i0 = im0.astype(jnp.float32).reshape(BH, W, C).transpose(2, 0, 1)
    i1 = im1.astype(jnp.float32).reshape(BH, W, C).transpose(2, 0, 1)
    o0, o1 = _pair_core(
        i0, i1, flow0, flow1, B=B, H=H, W=W, C=C, S=S,
        interpret=interpret, unchecked=kernel.endswith("unchecked"),
        inner=_inner_for(kernel),
    )
    back = lambda o: o.transpose(1, 2, 0).reshape(B, H, W, C).astype(dtype)
    return back(o0), back(o1)


def _warp_pair_fwd(im0, im1, flow0, flow1, kernel, interpret):
    out = warp_pair_op(im0, im1, flow0, flow1, kernel, interpret)
    return out, (im0, im1, flow0, flow1)


def _warp_pair_bwd(kernel, interpret, res, g):
    # kernels are bit-exact with the XLA warp; its VJP is the true grad
    _, vjp = jax.vjp(_pair_xla, *res)
    return vjp(g)


warp_pair_op.defvjp(_warp_pair_fwd, _warp_pair_bwd)


def flow_warp_pair_dispatch(im0, im1, flow0, flow1, impl: str = "auto"):
    kernel, interpret = resolve_warp_impl(impl, im0.shape[-1])
    if kernel == "xla":
        return _pair_xla(im0, im1, flow0, flow1)
    return warp_pair_op(im0, im1, flow0, flow1, kernel, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def planar_warp_pair_op(img0_chw, img1_chw, flow0, flow1, B: int,
                        kernel: str, interpret: bool):
    """Planar-in planar-out warp pair under one cond (the planar tail's
    scale-0 blend / pre-align legs)."""
    C, BH, W = img0_chw.shape
    H = BH // B
    S = 64
    if kernel == "xla" or H % TILE_H or W % TILE_W or W < 3 * TILE_W \
            or H < S:
        return (_planar_ref(img0_chw, flow0, B),
                _planar_ref(img1_chw, flow1, B))
    return _pair_core(
        img0_chw, img1_chw, flow0, flow1, B=B, H=H, W=W, C=C, S=S,
        interpret=interpret, unchecked=kernel.endswith("unchecked"),
        inner=_inner_for(kernel),
    )


def _planar_pair_fwd(img0_chw, img1_chw, flow0, flow1, B, kernel,
                     interpret):
    out = planar_warp_pair_op(img0_chw, img1_chw, flow0, flow1, B,
                              kernel, interpret)
    return out, (img0_chw, img1_chw, flow0, flow1)


def _planar_pair_bwd(B, kernel, interpret, res, g):
    i0, i1, f0, f1 = res
    _, vjp = jax.vjp(
        lambda a0, a1, u0, u1: (_planar_ref(a0, u0, B),
                                _planar_ref(a1, u1, B)),
        i0, i1, f0, f1,
    )
    return vjp(g)


planar_warp_pair_op.defvjp(_planar_pair_fwd, _planar_pair_bwd)


def flow_warp_planar_pair_dispatch(img0_chw, img1_chw, flow0, flow1,
                                   B: int, impl: str = "auto"):
    kernel, interpret = resolve_warp_impl(impl, img0_chw.shape[0])
    return planar_warp_pair_op(img0_chw, img1_chw, flow0, flow1, B,
                               kernel, interpret)


# ----------------------------------------------------------------------
# source-offset planar warps (spatial sharding)
#
# Under shard_map spatial serving (parallel/spatial.py), each shard
# computes a SLAB of output rows while the warp SOURCE is the full
# (all-gathered) image — backward warps read wherever the flow points,
# so unlike convs they cannot run on a bounded halo without changing
# semantics. The global row offset of the slab is folded into the
# flow's y component (the kernel's sy = local_row + fy then lands on
# global source coordinates), the slab extents are computed in global
# row space, and the kernel's grid covers only the slab rows
# (_pallas_path BH_out). Exactness rules identical to the full-frame
# ops: per-call cond falls back to the XLA gather on the full source.
# B == 1 only (serving).
# ----------------------------------------------------------------------

def _slab_extents_srcfull(flow_adj, W: int, S: int, H_full: int):
    """Per-tile slab origins for a source-offset warp.

    flow_adj: [H_out, W, 2] f32 with the global row offset ALREADY
    folded into [..., 1]. Origins are in full-source row space."""
    H_out = flow_adj.shape[0]
    n_th, n_tw = H_out // TILE_H, W // TILE_W
    fx = flow_adj[..., 0]
    fy = flow_adj[..., 1]
    col = jax.lax.broadcasted_iota(jnp.float32, (H_out, W), 1)
    row = jax.lax.broadcasted_iota(jnp.float32, (H_out, W), 0)
    x0 = jnp.floor(col + fx).astype(jnp.int32)
    y0 = jnp.floor(row + fy).astype(jnp.int32)
    xmin_t = jnp.clip(x0, 0, W - 1)
    xmax_t = jnp.clip(x0 + 1, 0, W - 1)
    ymin_t = jnp.clip(y0, 0, H_full - 1)
    ymax_t = jnp.clip(y0 + 1, 0, H_full - 1)

    def per_tile(a, op):
        return op(a.reshape(n_th, TILE_H, n_tw, TILE_W), axis=(1, 3))

    ymin_blk = (jnp.clip(per_tile(ymin_t, jnp.min), 0, H_full - S)
                // TILE_H) * TILE_H
    xmin_blk = (jnp.clip(per_tile(xmin_t, jnp.min), 0, W - 3 * TILE_W)
                // TILE_W) * TILE_W
    ok_y = jnp.all(per_tile(ymax_t, jnp.max) - ymin_blk <= S - 1)
    ok_x = jnp.all(per_tile(xmax_t, jnp.max) - xmin_blk <= 3 * TILE_W - 1)
    return ymin_blk, xmin_blk, ok_y & ok_x


def _srcfull_xla(img_full, flow_adj):
    """Exact fallback: sample the full planar source at global coords.

    img_full: [C, H_full, W] f32; flow_adj: [H_out, W, 2] with the row
    offset folded into y. Returns [C, H_out, W] f32."""
    C, H_full, W = img_full.shape
    H_out = flow_adj.shape[0]
    feat = img_full.transpose(1, 2, 0).reshape(1, H_full, W, C)
    x = (jax.lax.broadcasted_iota(jnp.float32, (H_out, W), 1)
         + flow_adj[..., 0])[None]
    y = (jax.lax.broadcasted_iota(jnp.float32, (H_out, W), 0)
         + flow_adj[..., 1])[None]
    out = warp_xla._sample_xy(feat, x, y)
    return out.reshape(H_out, W, C).transpose(2, 0, 1)


def planar_warp_pair_srcfull(img0_full, img1_full, flow0, flow1, row0,
                             impl: str = "auto",
                             interpret: Optional[bool] = None):
    """Warp pair with full planar sources and slab-local output rows.

    img*_full: [C, H_full, W] f32 (the all-gathered source planes);
    flow*: [1, H_out, W, 2] flows FOR the slab's rows; row0: traced
    int32 global row index of slab row 0. Returns two [C, H_out, W]
    f32 planar arrays. One exactness cond over both warps; falls back
    to the XLA gather on the full source (still exact for any flow).
    """
    C, H_full, W = img0_full.shape
    H_out = flow0.shape[1]
    kernel, interp = resolve_warp_impl(impl, C)
    if interpret is not None:
        interp = interpret
    off = jnp.zeros((1, 1, 2), jnp.float32).at[0, 0, 1].set(1.0) * \
        row0.astype(jnp.float32)
    f0 = flow0[0].astype(jnp.float32) + off
    f1 = flow1[0].astype(jnp.float32) + off
    S = 64
    eligible = (
        kernel not in ("xla", "nhwc")
        and H_out % TILE_H == 0 and W % TILE_W == 0
        and W >= 3 * TILE_W and H_full >= S
    )
    if not eligible:
        return _srcfull_xla(img0_full, f0), _srcfull_xla(img1_full, f1)
    ymin0, xmin0, ok0 = _slab_extents_srcfull(f0, W, S, H_full)
    ymin1, xmin1, ok1 = _slab_extents_srcfull(f1, W, S, H_full)
    ok = ok0 & ok1
    inner = _inner_for(kernel)
    fp0 = f0.transpose(2, 0, 1)  # planar [2, H_out, W]
    fp1 = f1.transpose(2, 0, 1)

    def fast(args):
        i0, i1, fp0, fp1, y0b, x0b, y1b, x1b = args

        def one(img, fp, yb, xb):
            return _pallas_path(
                img, fp, yb.reshape(-1), xb.reshape(-1),
                H=H_full, W=W, C=C, S=S, B=1, dtype=jnp.float32,
                interpret=interp, inner=inner, BH_out=H_out,
            )

        return one(i0, fp0, y0b, x0b), one(i1, fp1, y1b, x1b)

    def slow(args):
        i0, i1, fp0, fp1, *_ = args
        back = lambda fp: fp.transpose(1, 2, 0)
        return (_srcfull_xla(i0, back(fp0)), _srcfull_xla(i1, back(fp1)))

    if kernel.endswith("unchecked"):
        return fast((img0_full, img1_full, fp0, fp1,
                     ymin0, xmin0, ymin1, xmin1))
    return jax.lax.cond(
        ok, fast, slow,
        (img0_full, img1_full, fp0, fp1, ymin0, xmin0, ymin1, xmin1),
    )


# ----------------------------------------------------------------------
# fused dual-warp + occlusion blend
# ----------------------------------------------------------------------

def _pallas_blend_path(img0_chw, img1_chw, flow_cat, ymin0, xmin0, ymin1,
                       xmin1, *, H, W, C, S, B, interpret=False):
    BH = B * H
    n_th, n_tw = BH // TILE_H, W // TILE_W
    kernel = functools.partial(
        _kernel_blend, H=H, W=W, C=C, S=S, n_tw=n_tw
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # ymin0, xmin0, ymin1, xmin1
        grid=(n_th * n_tw,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # img0 stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # img1 stays in HBM
            pl.BlockSpec(  # packed [fx0, fy0, fx1, fy1, occ] planes
                (5, TILE_H, TILE_W),
                lambda t, *_: (0, t // n_tw, t % n_tw),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (C, TILE_H, TILE_W),
            lambda t, *_: (0, t // n_tw, t % n_tw),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            # [slot, img, C, S, 3*128] double-buffered slab per source
            pltpu.VMEM((2, 2, C, S, 3 * TILE_W), jnp.float32),
            # raw per-image 4-tap sums; blend multiplies the SUM so the
            # result is bit-compatible with occ*warp0 + (1-occ)*warp1
            pltpu.VMEM((2, C, TILE_H, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, BH, W), jnp.float32),
        interpret=interpret,
    )(ymin0, xmin0, ymin1, xmin1, img0_chw, img1_chw, flow_cat)


def flow_warp_blend_tiled(im0: jnp.ndarray, im1: jnp.ndarray,
                          flow0: jnp.ndarray, flow1: jnp.ndarray,
                          occ: jnp.ndarray, slab_rows: int = 64,
                          interpret: bool = False,
                          unchecked: bool = False) -> jnp.ndarray:
    """occ*warp(im0,flow0) + (1-occ)*warp(im1,flow1), one fused kernel.

    The model blends two backward-warped frames at every decoder scale
    (reference network_base.py:496-498,511-528); fusing removes one
    full-resolution output stream, the separate blend pass, and the
    layout copies between them. Same applicability rules and exactness
    cond as flow_warp_tiled; the fallback composes the XLA warps.
    """
    B, H, W, C = im0.shape
    S = slab_rows

    def compose(a0, a1, f0, f1, oc):
        w0 = warp_xla.flow_warp(a0, f0)
        w1 = warp_xla.flow_warp(a1, f1)
        return oc * w0 + (1 - oc) * w1

    if H % TILE_H or W % TILE_W or W < 3 * TILE_W or H < S:
        return compose(im0, im1, flow0, flow1, occ)

    BH = B * H
    ymin0, xmin0, ok0 = _slab_extents(flow0, B, H, W, S)
    ymin1, xmin1, ok1 = _slab_extents(flow1, B, H, W, S)
    ok = ok0 & ok1

    dtype = im0.dtype
    img0_chw = im0.astype(jnp.float32).reshape(BH, W, C).transpose(2, 0, 1)
    img1_chw = im1.astype(jnp.float32).reshape(BH, W, C).transpose(2, 0, 1)
    # planar [5, BH, W] packing — channels-last would pad every flow
    # tile 25.6x (5 -> 128 lanes) in HBM and VMEM
    flow_cat = jnp.concatenate(
        [flow0.astype(jnp.float32), flow1.astype(jnp.float32),
         occ.astype(jnp.float32)], axis=-1,
    ).reshape(BH, W, 5).transpose(2, 0, 1)

    def fast(args):
        img0_chw, img1_chw, flow_cat, ymin0, xmin0, ymin1, xmin1 = args
        return _pallas_blend_path(
            img0_chw, img1_chw, flow_cat,
            ymin0.reshape(-1), xmin0.reshape(-1),
            ymin1.reshape(-1), xmin1.reshape(-1),
            H=H, W=W, C=C, S=S, B=B, interpret=interpret,
        )

    def slow(args):
        img0_chw, img1_chw, flow_cat, *_ = args
        a0 = img0_chw.transpose(1, 2, 0).reshape(B, H, W, C)
        a1 = img1_chw.transpose(1, 2, 0).reshape(B, H, W, C)
        f = flow_cat.transpose(1, 2, 0).reshape(B, H, W, 5)
        out = compose(a0, a1, f[..., 0:2], f[..., 2:4], f[..., 4:5])
        return out.reshape(BH, W, C).transpose(2, 0, 1)

    args = (img0_chw, img1_chw, flow_cat, ymin0, xmin0, ymin1, xmin1)
    if unchecked:
        out = fast(args)
    else:
        out = jax.lax.cond(ok, fast, slow, args)
    return out.transpose(1, 2, 0).reshape(B, H, W, C).astype(dtype)


def _blend_compose_xla(im0, im1, flow0, flow1, occ):
    w0 = warp_xla.flow_warp(im0, flow0)
    w1 = warp_xla.flow_warp(im1, flow1)
    return occ * w0 + (1 - occ) * w1


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _tiled_blend(im0, im1, flow0, flow1, occ, interpret: bool,
                 unchecked: bool = False):
    return flow_warp_blend_tiled(im0, im1, flow0, flow1, occ,
                                 interpret=interpret, unchecked=unchecked)


def _tiled_blend_fwd(im0, im1, flow0, flow1, occ, interpret, unchecked):
    out = _tiled_blend(im0, im1, flow0, flow1, occ, interpret, unchecked)
    return out, (im0, im1, flow0, flow1, occ)


def _tiled_blend_bwd(interpret, unchecked, res, g):
    # kernel forward is bit-exact with the composed XLA path, so the
    # composed VJP is the true gradient
    _, vjp = jax.vjp(_blend_compose_xla, *res)
    return vjp(g)


_tiled_blend.defvjp(_tiled_blend_fwd, _tiled_blend_bwd)


def flow_warp_blend(im0: jnp.ndarray, im1: jnp.ndarray,
                    flow0: jnp.ndarray, flow1: jnp.ndarray,
                    occ: jnp.ndarray, impl: str = "auto"):
    """(I_t, I_t_0, I_t_1) for one decoder blend site.

    I_t comes from the fused dual-warp+blend kernel (when the tile-slab
    kernel applies for this shape/impl); I_t_0/I_t_1 are produced by
    independent single-warp dispatches so XLA dead-code-eliminates them
    whenever the caller only consumes I_t (the serving path jits
    `...["I_t"]`). On the XLA/unsupported path the blend reuses the two
    warps directly — no double work.
    """
    # NOTE round-2 A/B (scripts/tpu_blend_ab.py): the fused dual-slab
    # kernel measured ~4-5% SLOWER at model level than two pipelined
    # single-warp kernels + XLA blend (lite 1080p 147.6 vs 140.8 ms,
    # lite 4K 647.4 vs 621.8 ms) — the separate kernels overlap their
    # slab DMAs across tiles better than one kernel draining two slabs
    # per tile. The fused kernel stays available (exact, tested) via
    # impl="tiled_blend"; every other impl uses the separate path.
    fused = impl in ("tiled_blend", "tiled_blend_unchecked")
    base_impl = "tiled" if fused else impl
    kernel, interpret = resolve_warp_impl(base_impl, im0.shape[-1])
    B, H, W, C = im0.shape
    shape_ok = not (H % TILE_H or W % TILE_W or W < 3 * TILE_W or H < 64)
    if fused and kernel == "chw" and shape_ok:
        # independent dispatches keep w0/w1 DCE-able when only I_t is
        # consumed (the fused kernel produces I_t by itself)
        w0 = flow_warp_dispatch(im0, flow0, base_impl)
        w1 = flow_warp_dispatch(im1, flow1, base_impl)
        I_t = _tiled_blend(im0, im1, flow0, flow1, occ, interpret,
                           impl == "tiled_blend_unchecked")
    else:
        # one exactness cond for the pair (VERDICT r2 item 6): both
        # warps feed I_t here, so nothing is lost to DCE
        w0, w1 = flow_warp_pair_dispatch(im0, im1, flow0, flow1, base_impl)
        I_t = occ * w0 + (1 - occ) * w1
    return I_t, w0, w1
