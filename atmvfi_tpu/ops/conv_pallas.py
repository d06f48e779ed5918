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
  * for each output row an A-matrix [9*Cin, TW] is assembled from the
    3x3 shifted slices; the 8 rows concatenate along lanes so ONE
    dot_general [Cout, 9Cin] x [9Cin, 8*TW] per grid step does all the
    FLOPs, with bias + PReLU fused on the f32 accumulator.

Weights are prepacked as [Cout, 9*Cin] with (dy*3+dx)-major row order
(`pack_conv3x3_weights`). Requires Cin % 8 == 0, Cout % 8 == 0,
W % 128 == 0 (wrappers fall back to XLA otherwise).
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


def pack_conv3x3_weights(k_hwio: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, Cin, Cout] HWIO -> [Cout, 9*Cin], (dy*3+dx)-major rows."""
    kh, kw, cin, cout = k_hwio.shape
    assert kh == 3 and kw == 3
    return k_hwio.reshape(9 * cin, cout).T


def _pick_plan(W: int, cin: int, cout: int, dtype_bytes: int):
    """-> (TW, rows_per_matmul): the largest 128-multiple lane tile
    dividing W (>= 256 when W is tiled, for the halo addressing) and
    the largest row chunk whose A-matrix keeps VMEM under budget."""
    budget = 10 * 1024 * 1024
    best = None
    for tw in (1280, 1024, 896, 768, 640, 512, 384, 256, 128):
        if W % tw or (tw < 2 * LANE and W != tw):
            continue
        for chunk in (8, 4, 2, 1):
            slab = 2 * 10 * cin * (tw + 2 * LANE) * dtype_bytes
            amat = 9 * cin * chunk * tw * dtype_bytes
            out = 2 * ROWS * cout * tw * dtype_bytes
            acc = cout * chunk * tw * 4
            if slab + amat + out + acc < budget:
                if best is None or tw > best[0]:
                    best = (tw, chunk)
                break
    if best is None:
        raise ValueError(
            f"no HCW conv tiling fits VMEM for W={W} cin={cin} cout={cout}"
        )
    return best


def _kernel(x_ref, kt_ref, bias_ref, slope_ref, out_ref, slab_ref, sem,
            *, BH, H, W, Cin, Cout, TW, CHUNK, n_wt, prelu, out_dtype):
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
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, TW), 1)
    def row_block(r):
        """A-matrix columns for output row r: [9Cin, TW]."""
        gy = rb * ROWS + r
        gy_img = gy % H
        pieces = []
        for dy in range(3):
            idx = jnp.clip(gy + dy - 1 - row_start, 0, 9)
            vrow = (gy_img + dy - 1 >= 0) & (gy_img + dy - 1 <= H - 1)
            row = slab_ref[slot, idx]            # [Cin, TW + 256]
            row = jnp.where(vrow, row, jnp.zeros_like(row))
            for dx in range(3):
                piece = row[:, LANE - 1 + dx : LANE - 1 + dx + TW]
                if dx != 1:
                    # zero-pad semantics at the image's left/right edge;
                    # also hides the stale un-DMA'd halo of edge tiles
                    x_lane = w0 + dx - 1 + lane_iota
                    ok = (x_lane >= 0) & (x_lane <= W - 1)
                    piece = jnp.where(ok, piece, jnp.zeros_like(piece))
                pieces.append(piece)
        return jnp.concatenate(pieces, axis=0)

    # CHUNK rows per matmul (VMEM-budgeted by _pick_plan): the chunk's
    # A-matrices concatenate along lanes -> one [Cout, 9Cin] x
    # [9Cin, CHUNK*TW] dot per chunk with the epilogue on the f32 acc
    for c0 in range(0, ROWS, CHUNK):
        amat = jnp.concatenate(
            [row_block(r) for r in range(c0, c0 + CHUNK)], axis=1
        )
        acc = jax.lax.dot_general(
            kt_ref[...], amat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Cout, CHUNK*TW] f32
        y = acc + bias_ref[...].reshape(Cout, 1)
        if prelu:
            s = slope_ref[...].reshape(Cout, 1)
            y = jnp.maximum(y, 0.0) + s * jnp.minimum(y, 0.0)
        for j in range(CHUNK):
            out_ref[c0 + j] = y[:, j * TW : (j + 1) * TW].astype(out_dtype)


def conv3x3_hcw(x: jnp.ndarray, kt: jnp.ndarray, bias: jnp.ndarray,
                slope: Optional[jnp.ndarray], H: int,
                interpret: bool = False) -> jnp.ndarray:
    """conv3x3 + bias (+ PReLU when slope given) on HCW activations.

    x: [B*H, Cin, W]; kt: packed [Cout, 9*Cin]; bias/slope: [Cout] f32.
    Returns [B*H, Cout, W] in x.dtype. Requires (B*H) % 8 == 0,
    Cin % 8 == 0, Cout % 8 == 0, W % 128 == 0, B*H >= 16.
    """
    BH, Cin, W = x.shape
    Cout = kt.shape[0]
    assert BH % ROWS == 0 and W % LANE == 0 and BH >= 16
    assert Cin % 8 == 0 and Cout % 8 == 0, (Cin, Cout)
    TW, chunk = _pick_plan(W, Cin, Cout, x.dtype.itemsize)
    n_rb, n_wt = BH // ROWS, W // TW
    kernel = functools.partial(
        _kernel, BH=BH, H=H, W=W, Cin=Cin, Cout=Cout, TW=TW, CHUNK=chunk,
        n_wt=n_wt, prelu=slope is not None, out_dtype=x.dtype,
    )
    if slope is None:
        slope = jnp.zeros((Cout,), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_rb * n_wt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # x stays in HBM
            pl.BlockSpec((Cout, 9 * Cin), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
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
        out_shape=jax.ShapeDtypeStruct((BH, Cout, W), x.dtype),
        interpret=interpret,
    )(x, kt.astype(x.dtype), bias.astype(jnp.float32),
      slope.astype(jnp.float32))


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


def nhwc_to_hcw(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B*H, Cpad8, W] (zero-padded channels).

    One transpose at the entry of a run of HCW convs; the pad rides the
    same copy. Padded channels stay zero through any conv whose packed
    weights were padded to match (pack_conv3x3_weights_padded).
    """
    B, H, W, C = x.shape
    cp = _pad8(C)
    if cp != C:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - C)))
    return x.reshape(B * H, W, cp).transpose(0, 2, 1)


def hcw_to_nhwc(x_hcw: jnp.ndarray, B: int, c_true: int) -> jnp.ndarray:
    """[B*H, Cpad, W] -> [B, H, W, c_true] (drops channel padding)."""
    BH, cp, W = x_hcw.shape
    x = x_hcw[:, :c_true, :].transpose(0, 2, 1)
    return x.reshape(B, BH // B, W, c_true)


def pack_conv3x3_weights_padded(k_hwio: jnp.ndarray) -> jnp.ndarray:
    """HWIO -> packed [Cout_pad8, 9*Cin_pad8] (zeros in the pad rows, so
    zero-padded input channels contribute nothing and padded output
    channels stay exactly zero)."""
    kh, kw, cin, cout = k_hwio.shape
    cinp, coutp = _pad8(cin), _pad8(cout)
    if (cinp, coutp) != (cin, cout):
        k_hwio = jnp.pad(
            k_hwio, ((0, 0), (0, 0), (0, cinp - cin), (0, coutp - cout))
        )
    return pack_conv3x3_weights(k_hwio)


def pad_channel_vec(v: jnp.ndarray) -> jnp.ndarray:
    """Pad a per-channel vector (bias / PReLU slope) to the 8-multiple."""
    c = v.shape[0]
    cp = _pad8(c)
    return jnp.pad(v, (0, cp - c)) if cp != c else v


def hcw_conv_applicable(shape4, on_tpu_only: bool = True) -> bool:
    """Whether a run of HCW Pallas convs is worth it for this NHWC shape."""
    B, H, W, C = shape4
    if (B * H) % ROWS or (B * H) < 16 or W % LANE:
        return False
    if on_tpu_only and jax.default_backend() != "tpu":
        return False
    return True


def resolve_conv_impl(impl: str, shape4) -> tuple:
    """-> (use_hcw, interpret) for one full-res conv run.

    'auto' uses the Pallas kernel on TPU when the shape qualifies;
    'pallas' forces it (interpret mode off-TPU, for tests); 'xla'
    disables. shape4 is the NHWC shape entering the run.
    """
    if impl == "xla":
        return False, False
    if not hcw_conv_applicable(shape4, on_tpu_only=False):
        return False, False
    if impl == "pallas":
        return True, jax.default_backend() != "tpu"
    return jax.default_backend() == "tpu", False
