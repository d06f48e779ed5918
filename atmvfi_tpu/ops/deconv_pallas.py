"""Pallas TPU k2s2 transposed convolution emitting HCW activations.

Deconv2x (ConvTranspose k=2, s=2 — reference `deconv`,
network_base.py:27-32) is the entry op of every decoder stage; at full
resolution its lax.conv_transpose costs ~35-40 ms/frame at 4K plus a
separate PReLU pass and an NHWC->HCW transpose before the stage's HCW
conv pair (PERF_NOTES round-2 trace: deconv line 62.7 ms lite-4K).

The op is four independent 1x1 convs (one per output parity (dy, dx)):

    out[2y'+dy, co, 2x'+dx] = sum_ci x[y', ci, x'] K[dy, dx, ci, co] + b

so the kernel is pure MXU work with NO spatial halo: per grid step the
four input rows feeding an 8-row output block are lane-concatenated
into A = [Cin, 4*TW] and FOUR matmuls [Cout, Cin] x A produce all
(dy, dx) parities; bias + PReLU fuse on the f32 accumulator. The
x-interleave happens OUTSIDE the kernel: the kernel writes two
half-width outputs (even / odd x) and one XLA minor-dim merge
produces [B*H_out, Cout, W_out] — in-kernel lane interleaves are not
Mosaic-portable (bf16 lane ops; see pallas_probe3).

Weights pack as four [Cout_pad, Cin_pad] matrices (dtype-granular
channel padding like conv_pallas). A custom VJP routes the backward
through the XLA conv_transpose composition (exact gradient).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atmvfi_tpu.ops.conv_pallas import (
    _mxu_row_passes, channel_pad, pad_channel_vec,
)

LANE = 128
ROWS = 8  # output rows per grid step (4 input rows)


def _stack_heads(cout: int) -> bool:
    """Whether to stack the four parity heads [Cout, Cin] into ONE
    [4*Cout, Cin] matmul. Same MXU-pass argument as
    conv_pallas.stack_dx_profitable: four M=Cout matmuls each stream
    all N columns for a fraction of the array's 128 rows; profitable
    for Cout_pad <= 96. Shares the ATMVFI_NO_STACKDX kill switch."""
    import os
    if os.environ.get("ATMVFI_NO_STACKDX"):
        return False
    return _mxu_row_passes(4 * cout) < 4 * _mxu_row_passes(cout)


def pack_deconv2x_weights(k_hwio: jnp.ndarray, act_dtype=jnp.float32):
    """[2, 2, Cin, Cout] -> four [Cout_pad, Cin_pad] (dy, dx order)."""
    kh, kw, cin, cout = k_hwio.shape
    assert kh == 2 and kw == 2
    # weight-provenance defense — see pack_conv3x3_weights (argsrc2
    # probe): arg-sourced small weight packs can reach Mosaic in a
    # non-default layout; the un-foldable 0*sum forces a real copy.
    k_hwio = k_hwio + 0.0 * jnp.sum(k_hwio)
    cinp = channel_pad(cin, act_dtype)
    coutp = channel_pad(cout, act_dtype)
    if (cinp, coutp) != (cin, cout):
        k_hwio = jnp.pad(
            k_hwio, ((0, 0), (0, 0), (0, cinp - cin), (0, coutp - cout))
        )
    return tuple(
        k_hwio[dy, dx].T for dy in range(2) for dx in range(2)
    )  # ((0,0),(0,1),(1,0),(1,1))


def _pick_tw(w_half: int, cin: int, cout: int, b: int) -> int:
    budget = 9 * 1024 * 1024
    for tw in (1280, 1024, 896, 768, 640, 512, 384, 256, 128):
        if w_half % tw:
            continue
        xin = 2 * 4 * cin * tw * b          # pipelined input block
        amat = cin * 4 * tw * b
        macc = 4 * cout * 4 * tw * 4
        outs = 2 * 2 * ROWS * cout * tw * b
        if xin + amat + macc + outs < budget:
            return tw
    raise ValueError(f"no deconv tiling fits VMEM: w/2={w_half} "
                     f"cin={cin} cout={cout}")


def deconv_fits(w_half: int, cin: int, cout: int, dtype) -> bool:
    """VMEM feasibility of the deconv tiling (route decisions must call
    this: _pick_tw raises for infeasible shapes — see conv_run_fits)."""
    nbytes = jnp.dtype(dtype).itemsize
    try:
        _pick_tw(w_half, channel_pad(cin, dtype), channel_pad(cout, dtype),
                 nbytes)
    except ValueError:
        return False
    return True


def _kernel(*refs, Cin, Cout, TW, W, Wt, prelu, out_dtype, precision,
            stack_heads):
    if stack_heads:
        x_ref, ks_ref, bias_ref, slope_ref, even_ref, odd_ref = refs
    else:
        (x_ref, k00_ref, k01_ref, k10_ref, k11_ref, bias_ref, slope_ref,
         even_ref, odd_ref) = refs
    # x_ref block: [4, Cin, TW] input rows; outputs: [8, Cout, TW] each.
    amat = jnp.concatenate([x_ref[i] for i in range(4)], axis=1)  # [Cin,4TW]
    bias = bias_ref[...].reshape(Cout, 1)
    slope = slope_ref[...].reshape(Cout, 1)

    def post(m):
        m = m + bias
        if prelu:
            m = jnp.maximum(m, 0.0) + slope * jnp.minimum(m, 0.0)
        return m

    if stack_heads:
        m4 = jax.lax.dot_general(
            ks_ref[...], amat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # [4*Cout, 4*TW] f32
        m00, m01, m10, m11 = (
            post(m4[i * Cout : (i + 1) * Cout]) for i in range(4)
        )
    else:
        def head(kref):
            return post(jax.lax.dot_general(
                kref[...], amat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            ))  # [Cout, 4*TW] f32

        m00, m01, m10, m11 = (head(r) for r in
                              (k00_ref, k01_ref, k10_ref, k11_ref))
    if Wt < W:
        # lane-padded input: half-cols >= Wt are outside the image and
        # may hold anything; zero the corresponding output lanes so the
        # consumer kernels' halo reads see clean zero padding
        col = pl.program_id(1) * TW + jax.lax.broadcasted_iota(
            jnp.int32, (1, TW), 1
        )
        col_ok = col < Wt
        mask = lambda m: jnp.where(col_ok, m, 0.0)
    else:
        mask = lambda m: m
    for j in range(4):
        sl = slice(j * TW, (j + 1) * TW)
        even_ref[2 * j] = mask(m00[:, sl]).astype(out_dtype)      # dy=0,dx=0
        odd_ref[2 * j] = mask(m01[:, sl]).astype(out_dtype)       # dy=0,dx=1
        even_ref[2 * j + 1] = mask(m10[:, sl]).astype(out_dtype)  # dy=1,dx=0
        odd_ref[2 * j + 1] = mask(m11[:, sl]).astype(out_dtype)   # dy=1,dx=1


def deconv2x_hcw(x_hcw: jnp.ndarray, kt, bias: jnp.ndarray,
                 slope: Optional[jnp.ndarray],
                 w_true: Optional[int] = None,
                 interpret: bool = False) -> jnp.ndarray:
    """k2s2 ConvTranspose (+bias, +PReLU) on HCW activations.

    x_hcw: [B*h, Cin_pad, w] half-res; kt: pack_deconv2x_weights
    output; bias/slope [Cout] f32. Returns [B*2h, Cout_pad, 2w].
    Requires (B*h) % 4 == 0 and w % 128 == 0. w_true < w marks
    lane-padded input: output lanes beyond 2*w_true are zeroed so the
    consumer's halo reads see clean zero padding.
    """
    BH, Cin, w = x_hcw.shape
    k00, k01, k10, k11 = kt
    Cout = k00.shape[0]
    wt = w if w_true is None else w_true
    gran = 16 if x_hcw.dtype.itemsize == 2 else 8
    assert BH % 4 == 0 and w % LANE == 0 and 0 < wt <= w
    assert Cin % gran == 0 and Cout % gran == 0, (Cin, Cout, gran)
    TW = _pick_tw(w, Cin, Cout, x_hcw.dtype.itemsize)
    n_rb, n_wt = BH // 4, w // TW
    dt = x_hcw.dtype
    stack = _stack_heads(Cout)
    kernel = functools.partial(
        _kernel, Cin=Cin, Cout=Cout, TW=TW, W=w, Wt=wt,
        prelu=slope is not None, out_dtype=dt, stack_heads=stack,
        # true-f32 MXU passes for f32 activations (TPU DEFAULT is
        # single-pass bf16 — see conv_pallas.conv3x3_hcw)
        precision=(jax.lax.Precision.HIGHEST
                   if dt == jnp.float32 else None),
    )
    if slope is None:
        slope = jnp.zeros((Cout,), jnp.float32)
    if stack:
        wargs = [jnp.concatenate([k00, k01, k10, k11], axis=0).astype(dt)]
    else:
        wargs = [k00.astype(dt), k01.astype(dt), k10.astype(dt),
                 k11.astype(dt)]
    wspec = pl.BlockSpec((wargs[0].shape[0], Cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((Cout,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec(
        (ROWS, Cout, TW), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    even, odd = pl.pallas_call(
        kernel,
        grid=(n_rb, n_wt),
        in_specs=[
            pl.BlockSpec((4, Cin, TW), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            *([wspec] * len(wargs)), vspec, vspec,
        ],
        out_specs=(ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct((2 * BH, Cout, w), dt),
            jax.ShapeDtypeStruct((2 * BH, Cout, w), dt),
        ),
        interpret=interpret,
    )(x_hcw, *wargs,
      bias.astype(jnp.float32), slope.astype(jnp.float32))
    # x-interleave: one XLA minor-dim merge (in-kernel lane interleaves
    # are not Mosaic-portable)
    return jnp.stack([even, odd], axis=-1).reshape(2 * BH, Cout, 2 * w)


def _xla_equiv(x_hcw, k_hwio, bias, slope, prelu: bool,
               w_true: Optional[int] = None):
    """XLA conv_transpose composition equal to deconv2x_hcw."""
    BH, cp, w = x_hcw.shape
    wt = w if w_true is None else w_true
    cin, cout = k_hwio.shape[2], k_hwio.shape[3]
    xn = x_hcw[:, :cin, :wt].transpose(0, 2, 1)[None]  # [1, BH, wt, cin]
    y = jax.lax.conv_transpose(
        xn, k_hwio[::-1, ::-1].astype(xn.dtype), strides=(2, 2),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias.astype(xn.dtype)
    if prelu:
        s = slope.astype(y.dtype)
        y = jnp.maximum(y, 0) + s * jnp.minimum(y, 0)
    coutp = channel_pad(cout, x_hcw.dtype)
    if coutp != cout or wt != w:
        y = jnp.pad(
            y, ((0, 0), (0, 0), (0, 2 * (w - wt)), (0, coutp - cout))
        )
    return y[0].transpose(0, 2, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def deconv2x_hcw_op(x_hcw, k_hwio, bias, slope, prelu: bool,
                    interpret: bool, w_true: Optional[int] = None):
    """Differentiable HCW deconv2x; k_hwio [2, 2, Cin, Cout] f32."""
    kt = pack_deconv2x_weights(k_hwio, x_hcw.dtype)
    return deconv2x_hcw(
        x_hcw, kt, pad_channel_vec(bias, x_hcw.dtype),
        pad_channel_vec(slope, x_hcw.dtype) if prelu else None,
        w_true=w_true, interpret=interpret,
    )


def _op_fwd(x_hcw, k_hwio, bias, slope, prelu, interpret, w_true):
    out = deconv2x_hcw_op(x_hcw, k_hwio, bias, slope, prelu, interpret,
                          w_true)
    return out, (x_hcw, k_hwio, bias, slope)


def _op_bwd(prelu, interpret, w_true, res, g):
    x_hcw, k_hwio, bias, slope = res
    _, vjp = jax.vjp(
        lambda x, k, b, s: _xla_equiv(x, k, b, s, prelu, w_true),
        x_hcw, k_hwio, bias, slope,
    )
    return vjp(g)


deconv2x_hcw_op.defvjp(_op_fwd, _op_bwd)
