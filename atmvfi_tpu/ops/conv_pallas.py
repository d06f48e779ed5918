"""Pallas TPU 3x3 convolution for full-resolution stages (HCW layout).

Round-1 traces showed XLA's conv path at the full-res decoder/refiner
stages costs 31-48 ms per conv at 4K (bf16) against a ~4-10 ms
compute/bandwidth floor — the overhead is conv-boundary layout copies
plus an unfused PReLU pass (PERF_NOTES.md "Where the data formatting
time lives"; probed in scripts/tpu_conv_probe.py — an XLA im2col
formulation is no better and OOMs at 101 channels).

This kernel computes conv3x3(stride 1, 'same' zero pad) + bias + PReLU
in one pass as an MXU matmul:

  * activations live in HCW layout [B*H, C, W]: rows in the tile-array
    dim, channels in sublanes, W in lanes. A fixed-row slice is then a
    relayout-free [C, W] matrix — the only planar layout in which the
    channel contraction can feed the MXU directly.
  * per (8-row, TW-lane) grid step a [10, Cin, TW+256] slab is DMA'd
    (double buffered) with a 128-lane halo on each side; 'same' zero
    padding falls out of lane masks + per-(row,dy) scalar selects (also
    correct across batch-image boundaries in the packed B*H dim).
  * the contraction runs as THREE matmuls per row chunk — one per
    horizontal tap dx: [Cout, 3Cin] x [3Cin, CHUNK*(TW+256)] over a
    dy-concatenated A-matrix of ALIGNED full rows. The +-1-lane x-shift
    is applied on the OUTPUT side by adding lane-offset slices of the
    f32 results. This shape is dictated by measured Mosaic limits
    (scripts/pallas_probe3.py): concatenating lane-offset slices and
    bf16 lane rolls do not compile, but offset-slice arithmetic does.
  * bias + PReLU fuse on the f32 accumulator before the store.

Weights are prepacked as a per-dx triple [Cout, 3*Cin] with (dy, ci)
row order (`pack_conv3x3_weights`). Requires W % 128 == 0 and channel
counts padded to the dtype sublane tile (8 f32 / 16 bf16); wrappers
fall back to XLA otherwise.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ROWS = 8  # output rows per grid step


def _mxu_row_passes(m: int) -> int:
    """MXU weight-rows passes for an [M, K] x [K, N] matmul: the
    128x128 systolic array streams all N columns once per 128 weight
    rows, so time ~ ceil(M/128) * ceil(K/128) * N."""
    return -(-m // LANE)


def stack_dx_profitable(cout: int) -> bool:
    """Whether stacking the three per-dx weight matrices into ONE
    [3*Cout, 3*Cin] matmul reduces MXU passes. For narrow outputs
    (Cout_pad <= 80) three M=Cout matmuls each pay a full N-stream for
    a fraction of the array's 128 rows; one stacked matmul recovers up
    to 3x of that time. Never worse: ceil(3C/128) <= 3*ceil(C/128).
    The dx results come back as static sublane slices of the f32
    accumulator (offsets are channel_pad multiples). Kill switch:
    ATMVFI_NO_STACKDX=1 (device-risk gate for the value-slice lowering).
    """
    import os
    if os.environ.get("ATMVFI_NO_STACKDX"):
        return False
    return _mxu_row_passes(3 * cout) < 3 * _mxu_row_passes(cout)


def pack_conv3x3_weights(k_hwio: jnp.ndarray):
    """[3, 3, Cin, Cout] HWIO -> 3 per-dx matrices [Cout, 3*Cin] with
    (dy, ci)-ordered rows. The kernel runs one matmul per dx over a
    dy-concatenated A-matrix: lane-shifting activations inside the
    kernel is not portable (Mosaic rejects offset concats and bf16 lane
    rolls — scripts/pallas_probe3.py), but ADDING lane-offset slices of
    the f32 matmul results is supported, so the x-shift moves to the
    output side."""
    kh, kw, cin, cout = k_hwio.shape
    assert kh == 3 and kw == 3
    # WEIGHT-PROVENANCE DEFENSE (measured 2026-08-19, v5e,
    # scripts/tpu_argsrc2.py): when k is a jit ARGUMENT (flax param),
    # XLA satisfies this pad/slice/reshape/transpose chain without a
    # physical default-layout copy for small packs ((Cout,3Cin) =
    # (24,24) diverges by feature magnitude; (24,72) is exact), and
    # Mosaic reads the operand as if default-layout. `+ 0*sum(k)` is
    # un-foldable under IEEE (k could hold inf/NaN) and forces a real
    # materialization — k7 measured exact, optimization_barrier does
    # NOT work (k3), inline-generated weights never hit this (j1/k9).
    k_hwio = k_hwio + 0.0 * jnp.sum(k_hwio)
    # [dy, dx, ci, co] -> per dx: [dy*ci, co] -> [co, 3ci]
    return tuple(
        k_hwio[:, dx].reshape(3 * cin, cout).T for dx in range(3)
    )


def _pick_plan(W: int, cin: int, cout: int, dtype_bytes: int):
    """-> (TW, rows_per_matmul): the largest 128-multiple lane tile
    dividing W (>= 256 when W is tiled, for the halo addressing) and
    the largest row chunk whose A-matrix keeps VMEM under budget."""
    budget = 10 * 1024 * 1024
    best = None
    for tw in (1280, 1024, 896, 768, 640, 512, 384, 256, 128):
        if W % tw or (tw < 2 * LANE and W != tw):
            continue
        ext = tw + 2 * LANE
        for chunk in (8, 4, 2, 1):
            slab = 2 * 10 * cin * ext * dtype_bytes
            amat = 3 * cin * chunk * ext * dtype_bytes
            macc = 3 * cout * chunk * ext * 4
            out = 2 * ROWS * cout * tw * dtype_bytes
            if slab + amat + macc + out < budget:
                if best is None or tw > best[0]:
                    best = (tw, chunk)
                break
    if best is None:
        raise ValueError(
            f"no HCW conv tiling fits VMEM for W={W} cin={cin} cout={cout}"
        )
    return best


def _dx_matmuls(kt_refs, amat, Cout, precision):
    """The per-dx contraction: either three [Cout, 3Cin] matmuls or one
    stacked [3*Cout, 3Cin] matmul whose result is sliced back into the
    three per-dx planes (sublane offsets at channel_pad multiples).
    Returns [ms0, ms1, ms2], each [Cout, N] f32."""
    if len(kt_refs) == 1:
        m = jax.lax.dot_general(
            kt_refs[0][...], amat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # [3*Cout, N] f32
        return [m[i * Cout : (i + 1) * Cout] for i in range(3)]
    return [
        jax.lax.dot_general(
            kt_ref[...], amat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        for kt_ref in kt_refs
    ]


def _kernel(*refs, BH, H, W, Wt, Cin, Cout, TW, CHUNK, n_wt, prelu,
            out_dtype, precision, stack_dx):
    if stack_dx:
        (x_ref, kts_ref, bias_ref, slope_ref, out_ref, slab_ref,
         sem) = refs
        kt_refs = (kts_ref,)
    else:
        (x_ref, kt0_ref, kt1_ref, kt2_ref, bias_ref, slope_ref, out_ref,
         slab_ref, sem) = refs
        kt_refs = (kt0_ref, kt1_ref, kt2_ref)
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    rb = t // n_wt
    wt = t % n_wt

    def transfer(slot, tile, start):
        """Issue (or wait on) tile's slab DMA. The wait reconstructs the
        SAME descriptor under the SAME predicate so the semaphore is
        decremented by exactly the transferred byte count."""
        trb = tile // n_wt
        twt = tile % n_wt
        row_start = jnp.clip(trb * ROWS - 1, 0, BH - 10)

        def go(cp):
            cp.start() if start else cp.wait()

        if n_wt == 1:
            go(pltpu.make_async_copy(
                x_ref.at[pl.ds(row_start, 10), :, :],
                slab_ref.at[slot, :, :, pl.ds(LANE, W)],
                sem.at[slot],
            ))
            return
        first = twt == 0
        last = twt == n_wt - 1
        interior = jnp.logical_not(first | last)

        @pl.when(interior)
        def _():
            go(pltpu.make_async_copy(
                x_ref.at[
                    pl.ds(row_start, 10), :,
                    pl.ds(pl.multiple_of(twt * TW - LANE, LANE),
                          TW + 2 * LANE),
                ],
                slab_ref.at[slot],
                sem.at[slot],
            ))

        @pl.when(first)
        def _():
            go(pltpu.make_async_copy(
                x_ref.at[pl.ds(row_start, 10), :, pl.ds(0, TW + LANE)],
                slab_ref.at[slot, :, :, pl.ds(LANE, TW + LANE)],
                sem.at[slot],
            ))

        @pl.when(last)
        def _():
            go(pltpu.make_async_copy(
                x_ref.at[
                    pl.ds(row_start, 10), :,
                    pl.ds(pl.multiple_of(twt * TW - LANE, LANE), TW + LANE),
                ],
                slab_ref.at[slot, :, :, pl.ds(0, TW + LANE)],
                sem.at[slot],
            ))

    @pl.when(t == 0)
    def _():
        transfer(0, 0, start=True)

    @pl.when(t + 1 < n_t)
    def _():
        transfer((t + 1) % 2, t + 1, start=True)

    slot = t % 2
    transfer(slot, t, start=False)

    w0 = wt * TW
    row_start = jnp.clip(rb * ROWS - 1, 0, BH - 10)
    EXT = TW + 2 * LANE
    # zero invalid lanes ONCE per row: x < 0 / x >= W (zero padding) and
    # the stale un-DMA'd halo lanes of edge tiles
    # Wt < W is the LANE-PADDED case: lanes x >= Wt are semantically
    # outside the image ('same' zero padding), whatever the array holds
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, EXT), 1)
    x_full = w0 - LANE + lane_iota
    lane_ok = (x_full >= 0) & (x_full <= Wt - 1)

    def row_for(r, dy):
        gy = rb * ROWS + r
        gy_img = gy % H
        idx = jnp.clip(gy + dy - 1 - row_start, 0, 9)
        vrow = (gy_img + dy - 1 >= 0) & (gy_img + dy - 1 <= H - 1)
        row = slab_ref[slot, idx]                # [Cin, EXT]
        return jnp.where(vrow & lane_ok, row, jnp.zeros_like(row))

    # Per CHUNK rows: A = [3Cin, CHUNK*EXT] (dy-major sublane concat of
    # ALIGNED full rows; lane concat at EXT multiples — both offset-0,
    # the only concats Mosaic accepts). One matmul per dx, then the
    # +-1-lane x-shift happens on the OUTPUT side as adds of lane-offset
    # f32 slices (supported; see module docstring / pallas_probe3).
    for c0 in range(0, ROWS, CHUNK):
        amat = jnp.concatenate(
            [
                jnp.concatenate(
                    [row_for(r, dy) for dy in range(3)], axis=0
                )
                for r in range(c0, c0 + CHUNK)
            ],
            axis=1,
        )  # [3Cin, CHUNK*EXT]
        ms = _dx_matmuls(kt_refs, amat, Cout, precision)
        for j in range(CHUNK):
            base = j * EXT + LANE
            y = (
                ms[0][:, base - 1 : base - 1 + TW]
                + ms[1][:, base : base + TW]
                + ms[2][:, base + 1 : base + 1 + TW]
            )
            y = y + bias_ref[...].reshape(Cout, 1)
            if prelu:
                sl = slope_ref[...].reshape(Cout, 1)
                y = jnp.maximum(y, 0.0) + sl * jnp.minimum(y, 0.0)
            if Wt < W:
                # zero the padded lanes (they hold bias/PReLU(bias)
                # otherwise) so a following kernel's halo reads see
                # clean zero padding at the true right edge
                out_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (1, TW), 1
                )
                y = jnp.where(w0 + out_iota < Wt, y, 0.0)
            out_ref[c0 + j] = y.astype(out_dtype)


def conv3x3_hcw(x: jnp.ndarray, kt, bias: jnp.ndarray,
                slope: Optional[jnp.ndarray], H: int,
                w_true: Optional[int] = None,
                interpret: bool = False) -> jnp.ndarray:
    """conv3x3 + bias (+ PReLU when slope given) on HCW activations.

    x: [B*H, Cin, W]; kt: per-dx triple of [Cout, 3*Cin] (see
    pack_conv3x3_weights); bias/slope: [Cout] f32. Returns
    [B*H, Cout, W] in x.dtype. Requires (B*H) % 8 == 0, W % 128 == 0,
    B*H >= 16, and Cin/Cout multiples of the dtype's sublane tile
    (8 for f32, 16 for bf16 — channel_pad).

    w_true < W marks lane-padded activations: lanes x >= w_true are
    treated as outside the image on the read side (whatever the array
    holds) and zeroed on the write side, so a chain of kernels stays
    exactly equal to the unpadded conv at width w_true.
    """
    BH, Cin, W = x.shape
    kt0, kt1, kt2 = kt
    Cout = kt0.shape[0]
    wt = W if w_true is None else w_true
    gran = 16 if x.dtype.itemsize == 2 else 8
    assert BH % ROWS == 0 and W % LANE == 0 and BH >= 16
    assert 0 < wt <= W
    assert Cin % gran == 0 and Cout % gran == 0, (Cin, Cout, gran)
    TW, chunk = _pick_plan(W, Cin, Cout, x.dtype.itemsize)
    n_rb, n_wt = BH // ROWS, W // TW
    stack = stack_dx_profitable(Cout)
    kernel = functools.partial(
        _kernel, BH=BH, H=H, W=W, Wt=wt, Cin=Cin, Cout=Cout, TW=TW,
        CHUNK=chunk, n_wt=n_wt, prelu=slope is not None, out_dtype=x.dtype,
        stack_dx=stack,
        # f32 activations: force true-f32 MXU passes. TPU's DEFAULT
        # precision computes f32 dots as single-pass bf16 (measured
        # mean 1.7e-2 off a HIGHEST chain at 101ch/W1280 — see
        # scripts/tpu_chain_attrib.py); on the first conv of the
        # network that noise propagates everywhere and costs ~8 dB vs
        # the torch golden. bf16 activations are single-pass exact on
        # the MXU, so HIGHEST costs nothing there.
        precision=(jax.lax.Precision.HIGHEST
                   if x.dtype == jnp.float32 else None),
    )
    if slope is None:
        slope = jnp.zeros((Cout,), jnp.float32)
    dt = x.dtype
    if stack:
        wargs = [jnp.concatenate([kt0, kt1, kt2], axis=0).astype(dt)]
    else:
        wargs = [kt0.astype(dt), kt1.astype(dt), kt2.astype(dt)]
    wspec = pl.BlockSpec((wargs[0].shape[0], 3 * Cin), lambda t: (0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_rb * n_wt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # x stays in HBM
            *([wspec] * len(wargs)),
            pl.BlockSpec((Cout,), lambda t: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout,), lambda t: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ROWS, Cout, TW),
            lambda t: (t // n_wt, 0, t % n_wt),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 10, Cin, TW + 2 * LANE), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, Cout, W), dt),
        interpret=interpret,
    )(x, *wargs,
      bias.astype(jnp.float32), slope.astype(jnp.float32))


def _kernel_planes(*refs, BH, H, W, Wt, Cf, Cin, Cout, TW, CHUNK, n_wt,
                   prelu, out_dtype, precision, stack_dx):
    """conv3x3 over [HCW feat ‖ planar images]: the feat part DMAs like
    _kernel into slab channels [0, Cf); the image planes arrive as a
    GROUPED stack [NG, BH, 8, W] (to_grouped_planes) and each group
    DMAs into an 8-channel slab range [Cf+8g, Cf+8g+8) — so C=3 images
    feed the conv without ever materializing a full NHWC->HCW transpose
    (the refiner proj consumes five of them at full resolution). The
    groups must cover Cin - Cf channels (zero-padded), so every slab
    channel is DMA-written. Cf == 0 is the planes-only form (the
    encoder's first conv consumes the raw frames as planes): no x
    input exists.

    Why grouped (measured 2026-08-19 on v5e, scripts/pallas_probe5*):
    a flat [NP, BH, W] stack puts image ROWS in the memref's tiled
    sublane dim, where Mosaic requires 8-multiple slice SHAPES and
    PROVABLY 8-aligned dynamic starts (clip(8k-1,...) is neither), and
    per-plane slab writes are single-channel sublane slices, which
    Mosaic rejects on multi-lane-tile slabs (f32 allows them only at
    one lane tile; bf16 never). The grouped layout puts rows in an
    UNTILED dim (any dynamic start, any count — probe5c s3/s5) and
    makes the slab write an aligned 8-channel RANGE (probe5d d6/d9),
    legal for both dtypes at any width, so the 10-row double-buffered
    slab geometry is shared with the feat kernel."""
    if Cf:
        x_ref, planes_ref, *rest = refs
    else:
        planes_ref, *rest = refs
    if stack_dx:
        kts_ref, bias_ref, slope_ref, out_ref, slab_ref, sem = rest
        kt_refs = (kts_ref,)
    else:
        (kt0_ref, kt1_ref, kt2_ref, bias_ref, slope_ref, out_ref,
         slab_ref, sem) = rest
        kt_refs = (kt0_ref, kt1_ref, kt2_ref)
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    rb = t // n_wt
    wt = t % n_wt
    NG = (Cin - Cf) // 8

    def transfer(slot, tile, start):
        trb = tile // n_wt
        twt = tile % n_wt
        row_start = jnp.clip(trb * ROWS - 1, 0, BH - 10)

        def go(cp):
            cp.start() if start else cp.wait()

        def issue(col_src, col_dst, width):
            if Cf:
                go(pltpu.make_async_copy(
                    x_ref.at[pl.ds(row_start, 10), :,
                             pl.ds(col_src, width)],
                    slab_ref.at[slot, :, pl.ds(0, Cf),
                                pl.ds(col_dst, width)],
                    sem.at[slot, 0],
                ))
            for g in range(NG):
                go(pltpu.make_async_copy(
                    planes_ref.at[g, pl.ds(row_start, 10), :,
                                  pl.ds(col_src, width)],
                    slab_ref.at[slot, :, pl.ds(Cf + 8 * g, 8),
                                pl.ds(col_dst, width)],
                    sem.at[slot, 1 + g],
                ))

        if n_wt == 1:
            issue(0, LANE, W)
            return
        first = twt == 0
        last = twt == n_wt - 1
        interior = jnp.logical_not(first | last)

        @pl.when(interior)
        def _():
            issue(pl.multiple_of(twt * TW - LANE, LANE), 0, TW + 2 * LANE)

        @pl.when(first)
        def _():
            issue(0, LANE, TW + LANE)

        @pl.when(last)
        def _():
            issue(pl.multiple_of(twt * TW - LANE, LANE), 0, TW + LANE)

    @pl.when(t == 0)
    def _():
        transfer(0, 0, start=True)

    @pl.when(t + 1 < n_t)
    def _():
        transfer((t + 1) % 2, t + 1, start=True)

    slot = t % 2
    transfer(slot, t, start=False)

    w0 = wt * TW
    row_start = jnp.clip(rb * ROWS - 1, 0, BH - 10)
    EXT = TW + 2 * LANE
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, EXT), 1)
    x_full = w0 - LANE + lane_iota
    lane_ok = (x_full >= 0) & (x_full <= Wt - 1)

    def row_for(r, dy):
        gy = rb * ROWS + r
        gy_img = gy % H
        idx = jnp.clip(gy + dy - 1 - row_start, 0, 9)
        vrow = (gy_img + dy - 1 >= 0) & (gy_img + dy - 1 <= H - 1)
        row = slab_ref[slot, idx]                # [Cin, EXT]
        return jnp.where(vrow & lane_ok, row, jnp.zeros_like(row))

    for c0 in range(0, ROWS, CHUNK):
        amat = jnp.concatenate(
            [
                jnp.concatenate(
                    [row_for(r, dy) for dy in range(3)], axis=0
                )
                for r in range(c0, c0 + CHUNK)
            ],
            axis=1,
        )  # [3Cin, CHUNK*EXT]
        ms = _dx_matmuls(kt_refs, amat, Cout, precision)
        for j in range(CHUNK):
            base = j * EXT + LANE
            y = (
                ms[0][:, base - 1 : base - 1 + TW]
                + ms[1][:, base : base + TW]
                + ms[2][:, base + 1 : base + 1 + TW]
            )
            y = y + bias_ref[...].reshape(Cout, 1)
            if prelu:
                sl = slope_ref[...].reshape(Cout, 1)
                y = jnp.maximum(y, 0.0) + sl * jnp.minimum(y, 0.0)
            if Wt < W:
                out_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (1, TW), 1
                )
                y = jnp.where(w0 + out_iota < Wt, y, 0.0)
            out_ref[c0 + j] = y.astype(out_dtype)


def pack_conv3x3_weights_split(k_hwio: jnp.ndarray, cf_true: int,
                               act_dtype=jnp.float32):
    """HWIO [3, 3, cf_true + np_true, Cout] whose input channels are
    ordered [feat ‖ planes] -> per-dx packed triple laid out for the
    planes kernel's slab: feat weights at channels [0, cf_true), zeros
    to channel_pad(cf_true), plane weights right after, zeros to the
    padded total. Returns (kt_triple, cin_pad, cf_pad)."""
    kh, kw, cin, cout = k_hwio.shape
    assert kh == 3 and kw == 3 and 0 <= cf_true <= cin
    np_true = cin - cf_true
    cf_pad = channel_pad(cf_true, act_dtype)
    cin_pad = channel_pad(cf_pad + np_true, act_dtype)
    coutp = channel_pad(cout, act_dtype)
    k_eff = jnp.zeros((3, 3, cin_pad, coutp), k_hwio.dtype)
    k_eff = k_eff.at[:, :, :cf_true, :cout].set(k_hwio[:, :, :cf_true])
    k_eff = k_eff.at[:, :, cf_pad : cf_pad + np_true, :cout].set(
        k_hwio[:, :, cf_true:]
    )
    return pack_conv3x3_weights(k_eff), cin_pad, cf_pad


def to_grouped_planes(planes: jnp.ndarray, np_pad: int) -> jnp.ndarray:
    """[NP, BH, W] -> GROUPED [np_pad/8, BH, 8, W] with zero planes
    appended, so the planes kernel DMA-writes every slab channel
    (uninitialized VMEM could hold NaN patterns that survive 0-weight
    matmuls). The grouped layout is the only plane form whose slab DMA
    is Mosaic-legal at model widths — see _kernel_planes. The pad +
    regroup fuse into the one XLA copy the zero-pad already cost."""
    NP, BH, W = planes.shape
    extra = np_pad - NP
    assert extra >= 0 and np_pad % 8 == 0
    if extra:
        planes = jnp.concatenate(
            [planes, jnp.zeros((extra, BH, W), planes.dtype)], axis=0
        )
    return planes.reshape(np_pad // 8, 8, BH, W).transpose(0, 2, 1, 3)


def conv3x3_hcw_planes(x_hcw: jnp.ndarray, planes: jnp.ndarray, kt,
                       bias: jnp.ndarray, slope: Optional[jnp.ndarray],
                       H: int, w_true: Optional[int] = None,
                       interpret: bool = False) -> jnp.ndarray:
    """conv3x3+bias(+PReLU) over [HCW feat ‖ image planes].

    x_hcw: [B*H, Cf_pad, W] or None (planes-only form, Cf == 0 — the
    encoder's first conv); planes: GROUPED zero-padded stack
    [NG, B*H, 8, W] with Cf_pad + 8*NG == Cin_pad (to_grouped_planes);
    kt from pack_conv3x3_weights_split. Same constraints as
    conv3x3_hcw.
    """
    NG, BH, G, W = planes.shape
    assert G == 8, planes.shape
    NP = 8 * NG
    Cf = 0 if x_hcw is None else x_hcw.shape[1]
    dt = planes.dtype if x_hcw is None else x_hcw.dtype
    Cin = Cf + NP
    kt0, kt1, kt2 = kt
    Cout = kt0.shape[0]
    assert kt0.shape[1] == 3 * Cin, (kt0.shape, Cin)
    assert x_hcw is None or x_hcw.shape == (BH, Cf, W)
    wt = W if w_true is None else w_true
    gran = 16 if dt.itemsize == 2 else 8
    assert BH % ROWS == 0 and W % LANE == 0 and BH >= 16
    assert 0 < wt <= W
    assert Cf % gran == 0 and Cin % gran == 0 and Cout % gran == 0
    TW, chunk = _pick_plan(W, Cin, Cout, dt.itemsize)
    n_rb, n_wt = BH // ROWS, W // TW
    stack = stack_dx_profitable(Cout)
    kernel = functools.partial(
        _kernel_planes, BH=BH, H=H, W=W, Wt=wt, Cf=Cf, Cin=Cin, Cout=Cout,
        TW=TW, CHUNK=chunk, n_wt=n_wt, prelu=slope is not None,
        out_dtype=dt, stack_dx=stack,
        precision=(jax.lax.Precision.HIGHEST
                   if dt == jnp.float32 else None),
    )
    if slope is None:
        slope = jnp.zeros((Cout,), jnp.float32)
    if stack:
        wargs = [jnp.concatenate([kt0, kt1, kt2], axis=0).astype(dt)]
    else:
        wargs = [kt0.astype(dt), kt1.astype(dt), kt2.astype(dt)]
    wspec = pl.BlockSpec((wargs[0].shape[0], 3 * Cin), lambda t: (0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]  # planes in HBM
    args = [planes.astype(dt)]
    if x_hcw is not None:
        in_specs.insert(0, pl.BlockSpec(memory_space=pl.ANY))  # feat
        args.insert(0, x_hcw)
    in_specs += [
        *([wspec] * len(wargs)),
        pl.BlockSpec((Cout,), lambda t: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((Cout,), lambda t: (0,), memory_space=pltpu.VMEM),
    ]
    args += wargs + [bias.astype(jnp.float32), slope.astype(jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_rb * n_wt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (ROWS, Cout, TW),
            lambda t: (t // n_wt, 0, t % n_wt),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 10, Cin, TW + 2 * LANE), dt),
            pltpu.SemaphoreType.DMA((2, 1 + NG)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, Cout, W), dt),
        interpret=interpret,
    )(*args)


def _xla_equiv_planes(x_hcw, planes, k_hwio, bias, slope, H: int,
                      cf_true: int, prelu: bool,
                      w_true: Optional[int] = None):
    """XLA composition equal to conv3x3_hcw_planes (true channels)."""
    BH, cf_pad, W = x_hcw.shape
    B = BH // H
    wt = W if w_true is None else w_true
    cin, cout = k_hwio.shape[2], k_hwio.shape[3]
    np_true = cin - cf_true
    xf = x_hcw[:, :cf_true, :wt].transpose(0, 2, 1)
    xp = planes[:np_true, :, :wt].transpose(1, 2, 0)
    xn = jnp.concatenate([xf, xp.astype(xf.dtype)], axis=-1)
    xn = xn.reshape(B, H, wt, cin)
    y = jax.lax.conv_general_dilated(
        xn, k_hwio.astype(xn.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32) + bias.astype(jnp.float32)
    if prelu:
        s = slope.astype(jnp.float32)
        y = jnp.maximum(y, 0.0) + s * jnp.minimum(y, 0.0)
    y = y.astype(x_hcw.dtype)
    coutp = channel_pad(cout, x_hcw.dtype)
    if (coutp, wt) != (cout, W):
        y = jnp.pad(
            y, ((0, 0), (0, 0), (0, W - wt), (0, coutp - cout))
        )
    return y.reshape(BH, W, coutp).transpose(0, 2, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def conv3x3_hcw_planes_op(x_hcw, planes, k_hwio, bias, slope, H: int,
                          cf_true: int, prelu: bool, interpret: bool,
                          w_true: Optional[int] = None):
    """Differentiable conv3x3 over [HCW feat ‖ image planes].

    x_hcw: [B*H, channel_pad(cf_true), W] compute-dtype feat; planes:
    [NP_true, B*H, W] image planes (any float dtype — cast inside);
    k_hwio: [3, 3, cf_true + NP_true, Cout] f32 params with input
    channels ordered [feat ‖ planes]. Returns [B*H, pad(Cout), W]."""
    dt = x_hcw.dtype
    kt, cin_pad, cf_pad = pack_conv3x3_weights_split(k_hwio, cf_true, dt)
    assert cf_pad == x_hcw.shape[1], (cf_pad, x_hcw.shape)
    planes_p = to_grouped_planes(planes.astype(dt), cin_pad - cf_pad)
    return conv3x3_hcw_planes(
        x_hcw, planes_p, kt, pad_channel_vec(bias, dt),
        pad_channel_vec(slope, dt) if prelu else None,
        H=H, w_true=w_true, interpret=interpret,
    )


def _planes_op_fwd(x_hcw, planes, k_hwio, bias, slope, H, cf_true, prelu,
                   interpret, w_true):
    out = conv3x3_hcw_planes_op(x_hcw, planes, k_hwio, bias, slope, H,
                                cf_true, prelu, interpret, w_true)
    return out, (x_hcw, planes, k_hwio, bias, slope)


def _planes_op_bwd(H, cf_true, prelu, interpret, w_true, res, g):
    x_hcw, planes, k_hwio, bias, slope = res
    _, vjp = jax.vjp(
        lambda x, p, k, b, s: _xla_equiv_planes(
            x, p, k, b, s, H, cf_true, prelu, w_true
        ),
        x_hcw, planes, k_hwio, bias, slope,
    )
    return vjp(g)


conv3x3_hcw_planes_op.defvjp(_planes_op_fwd, _planes_op_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def conv3x3_planes_only_op(planes, k_hwio, bias, slope, H: int,
                           prelu: bool, interpret: bool,
                           w_true: Optional[int] = None):
    """Differentiable conv3x3 consuming ONLY image planes (the
    encoder's first conv: raw frames enter the kernel's slab by DMA,
    no NHWC->HCW transpose exists). planes: [C, B*H, W] in the compute
    dtype; k_hwio: [3, 3, C, Cout] f32. Returns [B*H, pad(Cout), W]."""
    dt = planes.dtype
    kt, cin_pad, _ = pack_conv3x3_weights_split(k_hwio, 0, dt)
    planes_p = to_grouped_planes(planes, cin_pad)
    return conv3x3_hcw_planes(
        None, planes_p, kt, pad_channel_vec(bias, dt),
        pad_channel_vec(slope, dt) if prelu else None,
        H=H, w_true=w_true, interpret=interpret,
    )


def _xla_equiv_planes_only(planes, k_hwio, bias, slope, H: int,
                           prelu: bool, w_true: Optional[int] = None):
    C, BH, W = planes.shape
    B = BH // H
    wt = W if w_true is None else w_true
    cout = k_hwio.shape[3]
    xn = planes[:, :, :wt].transpose(1, 2, 0).reshape(B, H, wt, C)
    y = jax.lax.conv_general_dilated(
        xn, k_hwio.astype(xn.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32) + bias.astype(jnp.float32)
    if prelu:
        s = slope.astype(jnp.float32)
        y = jnp.maximum(y, 0.0) + s * jnp.minimum(y, 0.0)
    y = y.astype(planes.dtype)
    coutp = channel_pad(cout, planes.dtype)
    if (coutp, wt) != (cout, W):
        y = jnp.pad(y, ((0, 0), (0, 0), (0, W - wt), (0, coutp - cout)))
    return y.reshape(BH, W, coutp).transpose(0, 2, 1)


def _planes_only_fwd(planes, k_hwio, bias, slope, H, prelu, interpret,
                     w_true):
    out = conv3x3_planes_only_op(planes, k_hwio, bias, slope, H, prelu,
                                 interpret, w_true)
    return out, (planes, k_hwio, bias, slope)


def _planes_only_bwd(H, prelu, interpret, w_true, res, g):
    planes, k_hwio, bias, slope = res
    _, vjp = jax.vjp(
        lambda p, k, b, s: _xla_equiv_planes_only(p, k, b, s, H, prelu,
                                                  w_true),
        planes, k_hwio, bias, slope,
    )
    return vjp(g)


conv3x3_planes_only_op.defvjp(_planes_only_fwd, _planes_only_bwd)


# ----------------------------------------------------------------------
# stride-2 conv3x3 (encoder downsampling stages) in HCW
# ----------------------------------------------------------------------

def _pick_plan_s2(Wout: int, cin: int, cout: int, dtype_bytes: int):
    """Largest 128-multiple OUTPUT lane tile dividing Wout whose VMEM
    footprint fits (input extent = 2*TW + 256 halo lanes)."""
    budget = 10 * 1024 * 1024
    best = None
    for tw in (1024, 896, 768, 640, 512, 384, 256, 128):
        if Wout % tw or (tw < 2 * LANE and Wout != tw):
            continue
        ext = 2 * tw + 2 * LANE
        for chunk in (8, 4, 2, 1):
            slab = 2 * 17 * cin * ext * dtype_bytes
            amat = 3 * cin * chunk * ext * dtype_bytes
            macc = 3 * cout * chunk * ext * 4
            splits = 3 * cout * (ext // 2) * 4
            out = 2 * ROWS * cout * tw * dtype_bytes
            if slab + amat + macc + splits + out < budget:
                if best is None or tw > best[0]:
                    best = (tw, chunk)
                break
    if best is None:
        raise ValueError(
            f"no s2 HCW conv tiling fits VMEM: Wout={Wout} cin={cin} "
            f"cout={cout}"
        )
    return best


def conv_s2_fits(Wout: int, cin: int, cout: int, dtype) -> bool:
    nbytes = jnp.dtype(dtype).itemsize
    try:
        _pick_plan_s2(Wout, channel_pad(cin, dtype),
                      channel_pad(cout, dtype), nbytes)
    except ValueError:
        return False
    return True


def _kernel_s2(*refs, BHin, Hout, Win, Wtin, Cin, Cout, TW, CHUNK, n_wt,
               prelu, out_dtype, precision, stack_dx):
    """conv3x3 stride 2, 'same' pad 1 (reference encoder stages): per 8
    OUTPUT rows a [17, Cin, EXT] input slab is DMA'd (rows 2y'-1..+15,
    128-lane halo); the contraction runs as the stride-1 kernel's three
    per-dx matmuls at INPUT lane resolution, then the stride-2 lane
    selection happens on the f32 results as parity-split gathers
    (E[x']=m[2x'], O[x']=m[2x'+1], per-page 128-lane take_along_axis)
    combined by offset-slice adds:
        out[x'] = O0[63+x'] + E1[64+x'] + O2[64+x']
    (the input halo is LANE=128 lanes, so the dx=-1 tap of output lane
    x' is input lane 2*(63+x')+1). All constructs are the measured
    Mosaic-portable set (pallas_probe3/4)."""
    if stack_dx:
        (x_ref, kts_ref, bias_ref, slope_ref, out_ref, slab_ref,
         sem) = refs
        kt_refs = (kts_ref,)
    else:
        (x_ref, kt0_ref, kt1_ref, kt2_ref, bias_ref, slope_ref, out_ref,
         slab_ref, sem) = refs
        kt_refs = (kt0_ref, kt1_ref, kt2_ref)
    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    rb = t // n_wt
    wt = t % n_wt
    Hin = 2 * Hout
    EXT = 2 * TW + 2 * LANE

    def transfer(slot, tile, start):
        trb = tile // n_wt
        twt = tile % n_wt
        row_start = jnp.clip(trb * 16 - 1, 0, BHin - 17)

        def go(cp):
            cp.start() if start else cp.wait()

        if n_wt == 1:
            go(pltpu.make_async_copy(
                x_ref.at[pl.ds(row_start, 17), :, :],
                slab_ref.at[slot, :, :, pl.ds(LANE, Win)],
                sem.at[slot],
            ))
            return
        first = twt == 0
        last = twt == n_wt - 1
        interior = jnp.logical_not(first | last)

        @pl.when(interior)
        def _():
            go(pltpu.make_async_copy(
                x_ref.at[
                    pl.ds(row_start, 17), :,
                    pl.ds(pl.multiple_of(twt * 2 * TW - LANE, LANE),
                          2 * TW + 2 * LANE),
                ],
                slab_ref.at[slot],
                sem.at[slot],
            ))

        @pl.when(first)
        def _():
            go(pltpu.make_async_copy(
                x_ref.at[pl.ds(row_start, 17), :, pl.ds(0, 2 * TW + LANE)],
                slab_ref.at[slot, :, :, pl.ds(LANE, 2 * TW + LANE)],
                sem.at[slot],
            ))

        @pl.when(last)
        def _():
            go(pltpu.make_async_copy(
                x_ref.at[
                    pl.ds(row_start, 17), :,
                    pl.ds(pl.multiple_of(twt * 2 * TW - LANE, LANE),
                          2 * TW + LANE),
                ],
                slab_ref.at[slot, :, :, pl.ds(0, 2 * TW + LANE)],
                sem.at[slot],
            ))

    @pl.when(t == 0)
    def _():
        transfer(0, 0, start=True)

    @pl.when(t + 1 < n_t)
    def _():
        transfer((t + 1) % 2, t + 1, start=True)

    slot = t % 2
    transfer(slot, t, start=False)

    w0_out = wt * TW                         # first output col of tile
    w0_in = 2 * w0_out
    row_start = jnp.clip(rb * 16 - 1, 0, BHin - 17)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, EXT), 1)
    x_in_full = w0_in - LANE + lane_iota
    lane_ok = (x_in_full >= 0) & (x_in_full <= Wtin - 1)

    def row_for(r, dy):
        gy_out = rb * ROWS + r
        gy_in = 2 * gy_out + dy - 1
        y_loc = 2 * (gy_out % Hout) + dy - 1
        idx = jnp.clip(gy_in - row_start, 0, 16)
        vrow = (y_loc >= 0) & (y_loc <= Hin - 1)
        row = slab_ref[slot, idx]                # [Cin, EXT]
        return jnp.where(vrow & lane_ok, row, jnp.zeros_like(row))

    half = EXT // 2
    n_hp = half // LANE
    par_iota = jax.lax.broadcasted_iota(jnp.int32, (Cout, LANE), 1)

    def parity_split(m, par):
        """[Cout, EXT] f32 -> [Cout, EXT//2] with out[y] = m[2y+par]."""
        pages = [m[:, p * LANE : (p + 1) * LANE] for p in range(EXT // LANE)]
        outs = []
        for q in range(n_hp):
            # output page q reads input lanes [256q+par, 256(q+1)+par)
            idx = 2 * par_iota + par        # 0..255 within the pair
            lo = jnp.take_along_axis(
                pages[2 * q], jnp.where(idx < LANE, idx, 0), axis=1
            )
            hi = jnp.take_along_axis(
                pages[2 * q + 1],
                jnp.where(idx >= LANE, idx - LANE, 0), axis=1,
            )
            outs.append(jnp.where(idx < LANE, lo, hi))
        return outs  # list of [Cout, 128] pages

    for c0 in range(0, ROWS, CHUNK):
        amat = jnp.concatenate(
            [
                jnp.concatenate(
                    [row_for(r, dy) for dy in range(3)], axis=0
                )
                for r in range(c0, c0 + CHUNK)
            ],
            axis=1,
        )  # [3Cin, CHUNK*EXT]
        ms = _dx_matmuls(kt_refs, amat, Cout, precision)
        for j in range(CHUNK):
            sl = slice(j * EXT, (j + 1) * EXT)
            o0 = parity_split(ms[0][:, sl], 1)   # O0[y] = m0[2y+1]
            e1 = parity_split(ms[1][:, sl], 0)   # E1[y] = m1[2y]
            o2 = parity_split(ms[2][:, sl], 1)   # O2[y] = m2[2y+1]
            o0f = jnp.concatenate(o0, axis=1)    # [Cout, half]
            e1f = jnp.concatenate(e1, axis=1)
            o2f = jnp.concatenate(o2, axis=1)
            y = (
                o0f[:, 63 : 63 + TW]
                + e1f[:, 64 : 64 + TW]
                + o2f[:, 64 : 64 + TW]
            )
            y = y + bias_ref[...].reshape(Cout, 1)
            if prelu:
                slp = slope_ref[...].reshape(Cout, 1)
                y = jnp.maximum(y, 0.0) + slp * jnp.minimum(y, 0.0)
            out_iota = jax.lax.broadcasted_iota(jnp.int32, (1, TW), 1)
            # zero lanes beyond the true output width (ceil(Wtin/2))
            y = jnp.where(2 * (w0_out + out_iota) < Wtin, y, 0.0)
            out_ref[c0 + j] = y.astype(out_dtype)


def conv3x3s2_hcw(x_hcw: jnp.ndarray, kt, bias: jnp.ndarray,
                  slope: Optional[jnp.ndarray], H_out: int,
                  w_true: Optional[int] = None,
                  interpret: bool = False) -> jnp.ndarray:
    """conv3x3 stride-2 pad-1 + bias (+PReLU) on HCW activations.

    x_hcw: [B*H_in, Cin_pad, W_in]; returns [B*H_in/2, Cout_pad,
    W_in/2]. Requires W_in % 256 == 0 (output lanes stay
    128-multiples), (B*H_in) % 16 == 0, even per-image heights.
    w_true < W_in marks lane-padded input; output lanes beyond
    ceil(w_true/2) are zeroed.
    """
    BHin, Cin, Win = x_hcw.shape
    kt0, kt1, kt2 = kt
    Cout = kt0.shape[0]
    wt = Win if w_true is None else w_true
    gran = 16 if x_hcw.dtype.itemsize == 2 else 8
    assert BHin % 16 == 0 and Win % 256 == 0 and BHin >= 32
    assert 0 < wt <= Win
    assert Cin % gran == 0 and Cout % gran == 0, (Cin, Cout, gran)
    Wout = Win // 2
    TW, chunk = _pick_plan_s2(Wout, Cin, Cout, x_hcw.dtype.itemsize)
    n_rb, n_wt = BHin // 16, Wout // TW
    stack = stack_dx_profitable(Cout)
    kernel = functools.partial(
        _kernel_s2, BHin=BHin, Hout=H_out, Win=Win, Wtin=wt, Cin=Cin,
        Cout=Cout, TW=TW, CHUNK=chunk, n_wt=n_wt,
        prelu=slope is not None, out_dtype=x_hcw.dtype,
        stack_dx=stack,
        precision=(jax.lax.Precision.HIGHEST
                   if x_hcw.dtype == jnp.float32 else None),
    )
    if slope is None:
        slope = jnp.zeros((Cout,), jnp.float32)
    dt = x_hcw.dtype
    if stack:
        wargs = [jnp.concatenate([kt0, kt1, kt2], axis=0).astype(dt)]
    else:
        wargs = [kt0.astype(dt), kt1.astype(dt), kt2.astype(dt)]
    wspec = pl.BlockSpec((wargs[0].shape[0], 3 * Cin), lambda t: (0, 0),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_rb * n_wt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            *([wspec] * len(wargs)),
            pl.BlockSpec((Cout,), lambda t: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout,), lambda t: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ROWS, Cout, TW),
            lambda t: (t // n_wt, 0, t % n_wt),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 17, Cin, 2 * TW + 2 * LANE), x_hcw.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BHin // 2, Cout, Wout), dt),
        interpret=interpret,
    )(x_hcw, *wargs,
      bias.astype(jnp.float32), slope.astype(jnp.float32))


def _xla_equiv_s2(x_hcw, k_hwio, bias, slope, H_out: int, prelu: bool,
                  w_true: Optional[int] = None):
    """XLA stride-2 conv equal to conv3x3s2_hcw on padded activations."""
    BHin, cp_, Win = x_hcw.shape
    Hin = 2 * H_out
    B = BHin // Hin
    wt = Win if w_true is None else w_true
    cin, cout = k_hwio.shape[2], k_hwio.shape[3]
    xn = x_hcw[:, :cin, :wt].transpose(0, 2, 1).reshape(B, Hin, wt, cin)
    y = jax.lax.conv_general_dilated(
        xn, k_hwio.astype(xn.dtype), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32) + bias.astype(jnp.float32)
    if prelu:
        s = slope.astype(jnp.float32)
        y = jnp.maximum(y, 0.0) + s * jnp.minimum(y, 0.0)
    y = y.astype(x_hcw.dtype)
    wt_out = y.shape[2]
    coutp = channel_pad(cout, x_hcw.dtype)
    Wout = Win // 2
    if (coutp, wt_out) != (cout, Wout):
        y = jnp.pad(
            y, ((0, 0), (0, 0), (0, Wout - wt_out), (0, coutp - cout))
        )
    return y.reshape(BHin // 2, Wout, coutp).transpose(0, 2, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def conv3x3s2_hcw_op(x_hcw, k_hwio, bias, slope, H_out: int, prelu: bool,
                     interpret: bool, w_true: Optional[int] = None):
    """Differentiable HCW stride-2 conv3x3(+bias+PReLU)."""
    dt = x_hcw.dtype
    kt = pack_conv3x3_weights_padded(k_hwio, dt)
    return conv3x3s2_hcw(
        x_hcw, kt, pad_channel_vec(bias, dt),
        pad_channel_vec(slope, dt) if prelu else None,
        H_out=H_out, w_true=w_true, interpret=interpret,
    )


def _s2_op_fwd(x_hcw, k_hwio, bias, slope, H_out, prelu, interpret,
               w_true):
    out = conv3x3s2_hcw_op(x_hcw, k_hwio, bias, slope, H_out, prelu,
                           interpret, w_true)
    return out, (x_hcw, k_hwio, bias, slope)


def _s2_op_bwd(H_out, prelu, interpret, w_true, res, g):
    x_hcw, k_hwio, bias, slope = res
    _, vjp = jax.vjp(
        lambda x, k, b, s: _xla_equiv_s2(x, k, b, s, H_out, prelu, w_true),
        x_hcw, k_hwio, bias, slope,
    )
    return vjp(g)


conv3x3s2_hcw_op.defvjp(_s2_op_fwd, _s2_op_bwd)


def conv3x3_nhwc_pallas(x: jnp.ndarray, k_hwio: jnp.ndarray,
                        bias: jnp.ndarray,
                        slope: Optional[jnp.ndarray] = None,
                        interpret: bool = False) -> jnp.ndarray:
    """NHWC wrapper (transposes at the boundary) — for tests/probing.

    In-model use should keep activations HCW across a run of convs and
    convert once at each end; this wrapper pays both transposes itself.
    """
    B, H, W, C = x.shape
    Cout = k_hwio.shape[-1]
    x_hcw = x.reshape(B * H, W, C).transpose(0, 2, 1)
    kt = pack_conv3x3_weights(k_hwio)
    y = conv3x3_hcw(x_hcw, kt, bias, slope, H=H, interpret=interpret)
    return y.transpose(0, 2, 1).reshape(B, H, W, Cout)


# ----------------------------------------------------------------------
# layout + padding helpers for in-model HCW conv runs
# ----------------------------------------------------------------------

def _pad8(c: int) -> int:
    return (c + 7) // 8 * 8


def channel_pad(c: int, dtype) -> int:
    """Channel-dim padding granularity: the Mosaic sublane tile is
    (8, 128) for 4-byte and (16, 128) for 2-byte dtypes; concatenating
    channel blocks at non-tile offsets is rejected by the compiler."""
    g = 16 if jnp.dtype(dtype).itemsize == 2 else 8
    return (c + g - 1) // g * g


def lane_pad(w: int) -> int:
    return (w + LANE - 1) // LANE * LANE


def nhwc_to_hcw(x: jnp.ndarray, w_pad: Optional[int] = None) -> jnp.ndarray:
    """[B, H, W, C] -> [B*H, Cpad, Wpad] (zero-padded channels AND
    lanes; channel pad granularity 8 for f32 / 16 for bf16, lane pad to
    the next 128-multiple — or to w_pad, e.g. to match a deconv
    output's 2*lane_pad(W/2) width for a channel concat).

    One transpose at the entry of a run of HCW convs; the pads ride the
    same copy. Padded channels stay zero through any conv whose packed
    weights were padded to match (pack_conv3x3_weights_padded); padded
    lanes are re-zeroed by the kernels' w_true masking.
    """
    B, H, W, C = x.shape
    cp = channel_pad(C, x.dtype)
    wp = lane_pad(W) if w_pad is None else w_pad
    assert wp >= W and wp % LANE == 0
    if (cp, wp) != (C, W):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wp - W), (0, cp - C)))
    return x.reshape(B * H, wp, cp).transpose(0, 2, 1)


def hcw_to_nhwc(x_hcw: jnp.ndarray, B: int, c_true: int,
                w_true: Optional[int] = None) -> jnp.ndarray:
    """[B*H, Cpad, Wpad] -> [B, H, w_true, c_true] (drops padding)."""
    BH, cp, W = x_hcw.shape
    wt = W if w_true is None else w_true
    x = x_hcw[:, :c_true, :wt].transpose(0, 2, 1)
    return x.reshape(B, BH // B, wt, c_true)


def pack_conv3x3_weights_padded(k_hwio: jnp.ndarray,
                                act_dtype=jnp.float32) -> jnp.ndarray:
    """HWIO -> packed [Cout_pad, 9*Cin_pad] (zeros in the pad rows, so
    zero-padded input channels contribute nothing and padded output
    channels stay exactly zero). Pad granularity follows the ACTIVATION
    dtype the kernel will run in (channel_pad)."""
    kh, kw, cin, cout = k_hwio.shape
    cinp = channel_pad(cin, act_dtype)
    coutp = channel_pad(cout, act_dtype)
    if (cinp, coutp) != (cin, cout):
        k_hwio = jnp.pad(
            k_hwio, ((0, 0), (0, 0), (0, cinp - cin), (0, coutp - cout))
        )
    return pack_conv3x3_weights(k_hwio)  # tuple of 3 [Coutp, 3*Cinp]


def pad_channel_vec(v: jnp.ndarray, act_dtype=jnp.float32) -> jnp.ndarray:
    """Pad a per-channel vector (bias / PReLU slope) to the activation
    dtype's channel granularity."""
    c = v.shape[0]
    cp = channel_pad(c, act_dtype)
    return jnp.pad(v, (0, cp - c)) if cp != c else v


MAX_PROFITABLE_CH = 160
MAX_PROFITABLE_CH_WIDE = 256  # admitted only with wide=True (per-preset)


def hcw_channels_profitable(channel_pairs, dtype, wide=False) -> bool:
    """Measured on device; the frontier is context-dependent:

    - Standalone (2026-08-19 sweeps, scripts/tpu_conv_shapes_ab
      --frontier + narrow-width cells) the kernel beats XLA at EVERY
      VMEM-feasible channel width incl. transposes: 2.13x @96ch,
      1.47 @128, 2.46 @160, 2.10 @192, 1.44-1.75 @229, 1.38 @256,
      down to padded W = 256 (>= 320ch is infeasible; conv_run_fits
      rejects).
    - IN-MODEL the 161-256 band diverges by model: lite's 240-ch
      decoder pairs win (+0.45-0.5 fps at 1080p/4K) while base's
      208-ch sites LOSE ~21 ms/frame at 1080p (in-model A/B,
      /tmp/dec_ab) — the surrounding graph's fusion/layout choices,
      not the conv itself, decide the band.

    So: padded channels <= 160 always; 161-256 admitted when the
    caller passes wide=True (per-preset measured knob,
    cfg.hcw_wide_channels — True for lite, False for base)."""
    lim = MAX_PROFITABLE_CH_WIDE if wide else MAX_PROFITABLE_CH
    return all(
        channel_pad(c, dtype) <= lim
        for p in channel_pairs for c in p
    )


def conv_run_fits(W: int, channel_pairs, dtype) -> bool:
    """Whether every (cin, cout) conv in an HCW run has a VMEM-feasible
    tiling at width W (channel padding applied here). Route decisions
    must consult this: _pick_plan RAISES for infeasible shapes (e.g.
    392->392 f32 at W=640, the base decoder mid stage at 2560-wide
    frames) and the wrapper should silently take the XLA path instead."""
    nbytes = jnp.dtype(dtype).itemsize
    for cin, cout in channel_pairs:
        try:
            _pick_plan(W, channel_pad(cin, dtype), channel_pad(cout, dtype),
                       nbytes)
        except ValueError:
            return False
    return True


def hcw_conv_applicable(shape4, on_tpu_only: bool = True,
                        min_w: int = 256) -> bool:
    """Whether a run of HCW Pallas convs is worth it for this NHWC
    shape. Widths need not be 128-multiples (lane padding + in-kernel
    w_true masking keep the chain exact), but below min_w the pad waste
    and dispatch overhead beat XLA's conv there."""
    B, H, W, C = shape4
    if (B * H) % ROWS or (B * H) < 16 or W < min_w:
        return False
    if on_tpu_only and jax.default_backend() != "tpu":
        return False
    return True


def resolve_conv_impl(impl: str, shape4) -> tuple:
    """-> (use_hcw, interpret) for one full-res conv run.

    'auto' uses the Pallas kernel on TPU when the shape qualifies;
    'pallas' forces it (interpret mode off-TPU, for tests; relaxed
    width floor so small-shape tests exercise the kernel); 'xla'
    disables. shape4 is the NHWC shape entering the run.
    """
    if impl == "xla":
        return False, False
    if impl == "pallas":
        if not hcw_conv_applicable(shape4, on_tpu_only=False, min_w=64):
            return False, False
        return True, jax.default_backend() != "tpu"
    if not hcw_conv_applicable(shape4, on_tpu_only=False):
        return False, False
    return jax.default_backend() == "tpu", False


# ----------------------------------------------------------------------
# differentiable entry point (training runs the fast forward; the
# backward falls back to the XLA conv composition, whose gradient is
# the true gradient because the kernel forward is exact)
# ----------------------------------------------------------------------

def _xla_equiv(x_hcw, k_hwio, bias, slope, H: int, prelu: bool,
               w_true: Optional[int] = None):
    """XLA composition equal to conv3x3_hcw on padded HCW activations."""
    BH, cp, W = x_hcw.shape
    B = BH // H
    wt = W if w_true is None else w_true
    cin, cout = k_hwio.shape[2], k_hwio.shape[3]
    xn = x_hcw[:, :cin, :wt].transpose(0, 2, 1).reshape(B, H, wt, cin)
    y = jax.lax.conv_general_dilated(
        xn, k_hwio.astype(xn.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32) + bias.astype(jnp.float32)
    if prelu:
        s = slope.astype(jnp.float32)
        y = jnp.maximum(y, 0.0) + s * jnp.minimum(y, 0.0)
    y = y.astype(x_hcw.dtype)
    coutp = channel_pad(cout, x_hcw.dtype)
    if (coutp, wt) != (cout, W):
        y = jnp.pad(
            y, ((0, 0), (0, 0), (0, W - wt), (0, coutp - cout))
        )
    return y.reshape(BH, W, coutp).transpose(0, 2, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def conv3x3_hcw_op(x_hcw, k_hwio, bias, slope, H: int, prelu: bool,
                   interpret: bool, w_true: Optional[int] = None):
    """Differentiable HCW conv3x3(+bias+PReLU) on padded activations.

    x_hcw: [B*H, pad8(Cin), W] (already in compute dtype); k_hwio:
    [3, 3, Cin, Cout] f32 params; bias/slope: [Cout] f32.
    Returns [B*H, pad8(Cout), W]. w_true < W: lane-padded semantics
    (see conv3x3_hcw).
    """
    dt = x_hcw.dtype
    kt = pack_conv3x3_weights_padded(k_hwio, dt)
    return conv3x3_hcw(
        x_hcw, kt, pad_channel_vec(bias, dt),
        pad_channel_vec(slope, dt) if prelu else None,
        H=H, w_true=w_true, interpret=interpret,
    )


def _op_fwd(x_hcw, k_hwio, bias, slope, H, prelu, interpret, w_true):
    out = conv3x3_hcw_op(x_hcw, k_hwio, bias, slope, H, prelu, interpret,
                         w_true)
    return out, (x_hcw, k_hwio, bias, slope)


def _op_bwd(H, prelu, interpret, w_true, res, g):
    x_hcw, k_hwio, bias, slope = res
    _, vjp = jax.vjp(
        lambda x, k, b, s: _xla_equiv(x, k, b, s, H, prelu, w_true),
        x_hcw, k_hwio, bias, slope,
    )
    return vjp(g)


conv3x3_hcw_op.defvjp(_op_fwd, _op_bwd)


# ----------------------------------------------------------------------
# fused conv3x3 -> conv3x3 pair (one kernel, intermediate stays in VMEM)
#
# The decoder/refiner/encoder stages run stride-1 conv PAIRS back to
# back; unfused, the intermediate [BH, Cmid, W] tensor makes a full HBM
# round trip (write + 10-row-slab re-read) between the two pallas
# calls. The fused kernel computes 10 intermediate rows per 8-output-
# row grid step into a VMEM scratch (25% stage-A row recompute, ~4% of
# the pair's FLOPs) and runs the second contraction from VMEM.
# Reference semantics: two chained `conv` blocks, e.g.
# /root/reference/network/network_base.py:20-25 + 198-210.
#
# Geometry: stage A emits the mid window [w0-64, w0+TW+64) (width
# TW+128, a 128-multiple so the output-side dx adds keep the measured-
# legal "unaligned offset, 128-multiple width" slice pattern); stage B
# consumes it with the usual +-1-lane output-side shift. Bit-exact vs
# the chained kernels: the mid scratch holds the same act-dtype values
# the unfused intermediate tensor would.
# ----------------------------------------------------------------------

SROWS_PAIR = 12  # input slab rows per grid step (8 out + 2x2 conv halo)


def _pick_plan_pair(W: int, cin: int, cmid: int, cout: int,
                    dtype_bytes: int):
    """-> (TW, chunk) or None when no tiling fits VMEM (caller falls
    back to two sequential kernels)."""
    budget = 10 * 1024 * 1024
    best = None
    for tw in (1280, 1024, 896, 768, 640, 512, 384, 256, 128):
        if W % tw or (tw < 2 * LANE and W != tw):
            continue
        ext = tw + 2 * LANE
        twm = tw + LANE
        for chunk in (8, 4, 2, 1):
            slab = 2 * SROWS_PAIR * cin * ext * dtype_bytes
            mid = 10 * cmid * twm * dtype_bytes
            amat = 3 * max(cin * ext, cmid * twm) * chunk * dtype_bytes
            macc = 3 * max(cmid, cout) * chunk * ext * 4
            out = 2 * ROWS * cout * tw * dtype_bytes
            if slab + mid + amat + macc + out < budget:
                if best is None or tw > best[0]:
                    best = (tw, chunk)
                break
    return best


def pair_run_fits(W: int, cin: int, cmid: int, cout: int, dtype) -> bool:
    nb = jnp.dtype(dtype).itemsize
    return _pick_plan_pair(
        W, channel_pad(cin, dtype), channel_pad(cmid, dtype),
        channel_pad(cout, dtype), nb,
    ) is not None


def _kernel_pair(*refs, BH, H, W, Wt, Cin, Cmid, Cout, TW, CHUNK, n_wt,
                 prelu_a, prelu_b, out_dtype, precision, stack_a, stack_b):
    i = 1
    x_ref = refs[0]
    na = 1 if stack_a else 3
    kta_refs = refs[i : i + na]
    i += na
    bias_a_ref, slope_a_ref = refs[i], refs[i + 1]
    i += 2
    nb = 1 if stack_b else 3
    ktb_refs = refs[i : i + nb]
    i += nb
    bias_b_ref, slope_b_ref = refs[i], refs[i + 1]
    i += 2
    out_ref, slab_ref, mid_ref, sem = refs[i : i + 4]

    t = pl.program_id(0)
    n_t = pl.num_programs(0)
    rb = t // n_wt
    wt = t % n_wt

    def transfer(slot, tile, start):
        trb = tile // n_wt
        twt = tile % n_wt
        row_start = jnp.clip(trb * ROWS - 2, 0, BH - SROWS_PAIR)

        def go(cp):
            cp.start() if start else cp.wait()

        if n_wt == 1:
            go(pltpu.make_async_copy(
                x_ref.at[pl.ds(row_start, SROWS_PAIR), :, :],
                slab_ref.at[slot, :, :, pl.ds(LANE, W)],
                sem.at[slot],
            ))
            return
        first = twt == 0
        last = twt == n_wt - 1
        interior = jnp.logical_not(first | last)

        @pl.when(interior)
        def _():
            go(pltpu.make_async_copy(
                x_ref.at[
                    pl.ds(row_start, SROWS_PAIR), :,
                    pl.ds(pl.multiple_of(twt * TW - LANE, LANE),
                          TW + 2 * LANE),
                ],
                slab_ref.at[slot],
                sem.at[slot],
            ))

        @pl.when(first)
        def _():
            go(pltpu.make_async_copy(
                x_ref.at[pl.ds(row_start, SROWS_PAIR), :,
                         pl.ds(0, TW + LANE)],
                slab_ref.at[slot, :, :, pl.ds(LANE, TW + LANE)],
                sem.at[slot],
            ))

        @pl.when(last)
        def _():
            go(pltpu.make_async_copy(
                x_ref.at[
                    pl.ds(row_start, SROWS_PAIR), :,
                    pl.ds(pl.multiple_of(twt * TW - LANE, LANE), TW + LANE),
                ],
                slab_ref.at[slot, :, :, pl.ds(0, TW + LANE)],
                sem.at[slot],
            ))

    @pl.when(t == 0)
    def _():
        transfer(0, 0, start=True)

    @pl.when(t + 1 < n_t)
    def _():
        transfer((t + 1) % 2, t + 1, start=True)

    slot = t % 2
    transfer(slot, t, start=False)

    w0 = wt * TW
    row_start = jnp.clip(rb * ROWS - 2, 0, BH - SROWS_PAIR)
    EXT = TW + 2 * LANE
    TWM = TW + LANE      # mid window width; col k <-> x = w0 - MOFF + k
    MOFF = LANE // 2

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, EXT), 1)
    x_full = w0 - LANE + lane_iota
    lane_ok = (x_full >= 0) & (x_full <= Wt - 1)

    def in_row(r_mid, dy):
        """Input slab row feeding mid row r_mid (global rb*8-1+r_mid)
        at tap dy, zeroed outside the mid row's own image. Out-of-range
        mid rows (the rb==0 / last-block edges) produce garbage here and
        are masked at their stage-B read."""
        gm = rb * ROWS - 1 + r_mid
        gy_img = gm % H
        idx = jnp.clip(gm + dy - 1 - row_start, 0, SROWS_PAIR - 1)
        vrow = (gy_img + dy - 1 >= 0) & (gy_img + dy - 1 <= H - 1)
        row = slab_ref[slot, idx]                # [Cin, EXT]
        return jnp.where(vrow & lane_ok, row, jnp.zeros_like(row))

    # ---- stage A: 10 mid rows over the TWM window into VMEM ----
    for c0 in range(0, 10, CHUNK):
        csz = min(CHUNK, 10 - c0)
        amat = jnp.concatenate(
            [
                jnp.concatenate(
                    [in_row(r, dy) for dy in range(3)], axis=0
                )
                for r in range(c0, c0 + csz)
            ],
            axis=1,
        )  # [3Cin, csz*EXT]
        ms = _dx_matmuls(kta_refs, amat, Cmid, precision)
        for j in range(csz):
            base = j * EXT + MOFF
            y = (
                ms[0][:, base - 1 : base - 1 + TWM]
                + ms[1][:, base : base + TWM]
                + ms[2][:, base + 1 : base + 1 + TWM]
            )
            y = y + bias_a_ref[...].reshape(Cmid, 1)
            if prelu_a:
                sl = slope_a_ref[...].reshape(Cmid, 1)
                y = jnp.maximum(y, 0.0) + sl * jnp.minimum(y, 0.0)
            mid_ref[c0 + j] = y.astype(out_dtype)

    # ---- stage B: 8 output rows from the VMEM mid ----
    lane_iota_m = jax.lax.broadcasted_iota(jnp.int32, (1, TWM), 1)
    x_mid = w0 - MOFF + lane_iota_m
    lane_ok_m = (x_mid >= 0) & (x_mid <= Wt - 1)

    def mid_row(r_out, dy):
        gy = rb * ROWS + r_out
        gy_img = gy % H
        vrow = (gy_img + dy - 1 >= 0) & (gy_img + dy - 1 <= H - 1)
        row = mid_ref[r_out + dy]                # [Cmid, TWM], static idx
        return jnp.where(vrow & lane_ok_m, row, jnp.zeros_like(row))

    for c0 in range(0, ROWS, CHUNK):
        amat = jnp.concatenate(
            [
                jnp.concatenate(
                    [mid_row(r, dy) for dy in range(3)], axis=0
                )
                for r in range(c0, c0 + CHUNK)
            ],
            axis=1,
        )  # [3Cmid, CHUNK*TWM]
        ms = _dx_matmuls(ktb_refs, amat, Cout, precision)
        for j in range(CHUNK):
            base = j * TWM + MOFF
            y = (
                ms[0][:, base - 1 : base - 1 + TW]
                + ms[1][:, base : base + TW]
                + ms[2][:, base + 1 : base + 1 + TW]
            )
            y = y + bias_b_ref[...].reshape(Cout, 1)
            if prelu_b:
                sl = slope_b_ref[...].reshape(Cout, 1)
                y = jnp.maximum(y, 0.0) + sl * jnp.minimum(y, 0.0)
            if Wt < W:
                out_iota = jax.lax.broadcasted_iota(jnp.int32, (1, TW), 1)
                y = jnp.where(w0 + out_iota < Wt, y, 0.0)
            out_ref[c0 + j] = y.astype(out_dtype)


def conv3x3_pair_hcw(x: jnp.ndarray, kta, bias_a, slope_a, ktb, bias_b,
                     slope_b, H: int, w_true: Optional[int] = None,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused conv3x3(+bias+PReLU) pair on HCW activations.

    x: [B*H, Cin, W]; kta/ktb: per-dx triples [Cmid|Cout, 3*Cin|3*Cmid]
    (pack_conv3x3_weights); bias/slope: [Cmid]/[Cout] f32 (slope None
    disables that stage's PReLU). Same alignment contract as
    conv3x3_hcw. Bit-exact vs chaining conv3x3_hcw twice."""
    BH, Cin, W = x.shape
    Cmid = kta[0].shape[0]
    Cout = ktb[0].shape[0]
    wt = W if w_true is None else w_true
    gran = 16 if x.dtype.itemsize == 2 else 8
    assert BH % ROWS == 0 and W % LANE == 0 and BH >= 16
    assert 0 < wt <= W
    assert Cin % gran == 0 and Cmid % gran == 0 and Cout % gran == 0
    plan = _pick_plan_pair(W, Cin, Cmid, Cout, x.dtype.itemsize)
    if plan is None:
        raise ValueError(
            f"no fused-pair tiling fits VMEM for W={W} "
            f"cin={Cin} cmid={Cmid} cout={Cout}"
        )
    TW, chunk = plan
    n_rb, n_wt = BH // ROWS, W // TW
    stack_a = stack_dx_profitable(Cmid)
    stack_b = stack_dx_profitable(Cout)
    kernel = functools.partial(
        _kernel_pair, BH=BH, H=H, W=W, Wt=wt, Cin=Cin, Cmid=Cmid,
        Cout=Cout, TW=TW, CHUNK=chunk, n_wt=n_wt,
        prelu_a=slope_a is not None, prelu_b=slope_b is not None,
        out_dtype=x.dtype, stack_a=stack_a, stack_b=stack_b,
        precision=(jax.lax.Precision.HIGHEST
                   if x.dtype == jnp.float32 else None),
    )
    if slope_a is None:
        slope_a = jnp.zeros((Cmid,), jnp.float32)
    if slope_b is None:
        slope_b = jnp.zeros((Cout,), jnp.float32)
    dt = x.dtype

    def wargs_of(kt, stack):
        if stack:
            return [jnp.concatenate(list(kt), axis=0).astype(dt)]
        return [k.astype(dt) for k in kt]

    wargs_a = wargs_of(kta, stack_a)
    wargs_b = wargs_of(ktb, stack_b)

    def wspec(w):
        return pl.BlockSpec(w.shape, lambda t: (0, 0),
                            memory_space=pltpu.VMEM)

    def vspec(c):
        return pl.BlockSpec((c,), lambda t: (0,), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_rb * n_wt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # x stays in HBM
            *[wspec(w) for w in wargs_a],
            vspec(Cmid), vspec(Cmid),
            *[wspec(w) for w in wargs_b],
            vspec(Cout), vspec(Cout),
        ],
        out_specs=pl.BlockSpec(
            (ROWS, Cout, TW),
            lambda t: (t // n_wt, 0, t % n_wt),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, SROWS_PAIR, Cin, TW + 2 * LANE), x.dtype),
            pltpu.VMEM((10, Cmid, TW + LANE), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, Cout, W), dt),
        interpret=interpret,
    )(x, *wargs_a, bias_a.astype(jnp.float32), slope_a.astype(jnp.float32),
      *wargs_b, bias_b.astype(jnp.float32), slope_b.astype(jnp.float32))


def _xla_equiv_pair(x_hcw, ka, bias_a, slope_a, kb, bias_b, slope_b,
                    H: int, prelu_a: bool, prelu_b: bool,
                    w_true: Optional[int] = None):
    mid = _xla_equiv(x_hcw, ka, bias_a, slope_a, H, prelu_a, w_true)
    return _xla_equiv(mid, kb, bias_b, slope_b, H, prelu_b, w_true)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def conv3x3_pair_hcw_op(x_hcw, ka, bias_a, slope_a, kb, bias_b, slope_b,
                        H: int, prelu_a: bool, prelu_b: bool,
                        interpret: bool, w_true: Optional[int] = None):
    """Differentiable fused HCW conv3x3 pair on padded activations.

    x_hcw: [B*H, pad(Cin), W]; ka/kb: [3, 3, Cin, Cmid]/[3, 3, Cmid,
    Cout] f32 params; bias/slope f32 vectors. Returns
    [B*H, pad(Cout), W]. Exactly equal to chaining conv3x3_hcw_op."""
    dt = x_hcw.dtype
    kta = pack_conv3x3_weights_padded(ka, dt)
    ktb = pack_conv3x3_weights_padded(kb, dt)
    return conv3x3_pair_hcw(
        x_hcw, kta, pad_channel_vec(bias_a, dt),
        pad_channel_vec(slope_a, dt) if prelu_a else None,
        ktb, pad_channel_vec(bias_b, dt),
        pad_channel_vec(slope_b, dt) if prelu_b else None,
        H=H, w_true=w_true, interpret=interpret,
    )


def _pair_op_fwd(x_hcw, ka, bias_a, slope_a, kb, bias_b, slope_b, H,
                 prelu_a, prelu_b, interpret, w_true):
    out = conv3x3_pair_hcw_op(x_hcw, ka, bias_a, slope_a, kb, bias_b,
                              slope_b, H, prelu_a, prelu_b, interpret,
                              w_true)
    return out, (x_hcw, ka, bias_a, slope_a, kb, bias_b, slope_b)


def _pair_op_bwd(H, prelu_a, prelu_b, interpret, w_true, res, g):
    x_hcw, ka, bias_a, slope_a, kb, bias_b, slope_b = res
    _, vjp = jax.vjp(
        lambda x, k1, b1, s1, k2, b2, s2: _xla_equiv_pair(
            x, k1, b1, s1, k2, b2, s2, H, prelu_a, prelu_b, w_true
        ),
        x_hcw, ka, bias_a, slope_a, kb, bias_b, slope_b,
    )
    return vjp(g)


conv3x3_pair_hcw_op.defvjp(_pair_op_fwd, _pair_op_bwd)
