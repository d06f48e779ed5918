"""Fused window attention + attention-to-motion Pallas TPU kernel.

The ATM operator (reference attention.py:187-213) needs, per window and
head: softmax(q k^T / sqrt(d) + mask), then BOTH the appearance output
`attn @ v` and the motion moment `sum_k attn[q,k] * rel[d,q,k]`. The
XLA path materializes the [BW, h, N, N] probability tensor in HBM
between those consumers; this kernel keeps it in VMEM and emits both
outputs in one pass (one HBM read of q/k/v(/mask), one write of
out/motion).

Grid: (window blocks, heads); each step processes `block_windows`
whole windows for one head. N in {64, 144} and head_dim <= 128, so all
per-window matmuls fit VMEM; softmax accumulates in f32.

A custom VJP falls back to the pure-jnp reference implementation for
the backward pass (training), so the kernel is inference-fast and
training-correct.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# 'auto' window-count gate: below this many packed windows the kernel's
# fixed dispatch + grid overhead can exceed its layout savings. The
# round-4 claim that 448x256 (56 local windows) regressed -3% did NOT
# reproduce in the round-5 alternating A/B (kernel 126.6-130 fps vs
# XLA 122.2-127.8 over 4 reps, v5e 2026-08-20 — PERF_NOTES round 5),
# so the floor sits below the smallest measured size as a guard for
# degenerate shapes only (e.g. the 12-window global branch at tiny
# inputs), not a measured crossover.
AUTO_MIN_WINDOWS = 32


def resolve_attention_impl(impl: str,
                           n_windows: Optional[int] = None) -> Tuple[bool, bool]:
    """-> (use_pallas, interpret).

    'auto' selects the PACKED layout-native Pallas kernel on TPU since
    the round-4 window-batched rewrite of its matmuls (one
    [wb, N, hd] batched dot_general per head instead of wb separate
    [N, hd] dots — _packed_kernel), UNLESS the static packed window
    count `n_windows` is below AUTO_MIN_WINDOWS (tiny problems, e.g.
    the reference's 448x256 Vimeo protocol res, are faster on XLA).
    History of the measurements:

      * round 2: generic [BW,h,N,d] kernel loses at model level to
        q/kv layout transitions (254 vs 237 ms at 1080p) -> auto=xla.
      * round 4, pre-rewrite: the packed kernel ALSO loses in-model
        (lite 4K 378.5 vs 373.5 ms, base 1080p 159.7 vs 148.4) — per-
        window matmuls starve the MXU.
      * round 4, post-rewrite (v5e 2026-08-20): standalone local-
        window bucket 14.9 vs 39.6 ms (XLA), global 7.8 vs 33.0;
        IN-MODEL lite 4K 291.4 vs 348.4 ms/frame (3.43 fps, -16%),
        base 1080p 129.3 vs 135.3 (-4.4%) -> auto=pallas on TPU.
      * round 5: auto regressed 448x256 by 3% (VERDICT item 4) ->
        the n_windows gate.

    'xla' forces the batched-matmul XLA path (the f32-softmax form);
    off-TPU, 'auto' stays XLA and 'pallas' runs in interpret mode
    (CPU tests).
    """
    if impl == "pallas":
        return True, jax.default_backend() != "tpu"
    if impl == "xla":
        return False, False
    if n_windows is not None and n_windows < AUTO_MIN_WINDOWS:
        return False, False
    return jax.default_backend() == "tpu", False


def resolve_attention_block_mode(impl: str,
                                 n_windows: Optional[int] = None
                                 ) -> Tuple[str, bool]:
    """-> (mode, interpret), mode in {"block", "packed", "xla"}.

    "block" = the round-5 fused transformer-block kernel
    (fused_atm_block: LN + q/kv/proj + swap + attention + residual in
    one pass); "packed" = the round-4 attention-only kernel; "xla" =
    batched-matmul HLOs. 'auto' resolves to "block" on TPU above the
    window gate since the round-5 device A/B (v5e 2026-08-20,
    scripts/tpu_block_attn_ab.py): in-model lite 4K 291.3 -> 273.7
    ms/frame (+6.0%), base 1080p 127.3 -> 125.7 (+1.3%) vs the packed
    kernel; demo golden unchanged (58.67 dB).
    """
    if impl == "pallas_block":
        return "block", jax.default_backend() != "tpu"
    if impl == "pallas":
        return "packed", jax.default_backend() != "tpu"
    if impl == "xla":
        return "xla", False
    if n_windows is not None and n_windows < AUTO_MIN_WINDOWS:
        return "xla", False
    return ("block" if jax.default_backend() == "tpu" else "xla"), False


def reference_window_attention(q, k, v, scale, rel=None, mask=None):
    """Pure-jnp reference: q,k,v [BW,h,N,d]; mask [BW,N,N]; rel [2,N,N]."""
    attn = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        attn = attn + mask[:, None].astype(attn.dtype)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(q.dtype), v)
    motion = None
    if rel is not None:
        motion = jnp.einsum("bhqk,dqk->bhqd", attn, rel.astype(jnp.float32))
        motion = motion.astype(q.dtype)  # [BW, h, N, 2]
    return out, motion


def _kernel(q_ref, k_ref, v_ref, rel_ref, mask_ref, out_ref, motion_ref,
            *, scale, block_windows, with_motion, with_mask, precision):
    for w in range(block_windows):
        q = q_ref[w, 0]
        k = k_ref[w, 0]
        attn = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ) * scale
        if with_mask:
            attn = attn + mask_ref[w].astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1)  # f32 [N, N]
        a = attn.astype(v_ref.dtype)
        out_ref[w, 0] = jax.lax.dot_general(
            a, v_ref[w, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ).astype(out_ref.dtype)
        if with_motion:
            mx = jnp.sum(attn * rel_ref[0].astype(jnp.float32), axis=-1)
            my = jnp.sum(attn * rel_ref[1].astype(jnp.float32), axis=-1)
            motion_ref[w, 0] = jnp.stack([mx, my], axis=-1).astype(
                motion_ref.dtype
            )


def _pad_windows(x, bw_pad):
    pad = bw_pad - x.shape[0]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 6, 7)
)
def fused_window_attention(q, k, v, scale, rel, mask,
                           block_windows: int = 8, interpret: bool = False):
    """q,k,v: [BW, h, N, d]; rel: [2,N,N] or None; mask: [BW,N,N] or None.

    Returns (out [BW,h,N,d], motion [BW,h,N,2] or None).
    """
    return _forward(q, k, v, scale, rel, mask, block_windows, interpret)


def _forward(q, k, v, scale, rel, mask, block_windows, interpret):
    BW, h, N, d = q.shape
    with_motion = rel is not None
    with_mask = mask is not None
    wb = min(block_windows, BW)
    bw_pad = ((BW + wb - 1) // wb) * wb
    qp = _pad_windows(q, bw_pad)
    kp = _pad_windows(k, bw_pad)
    vp = _pad_windows(v, bw_pad)
    args = [qp, kp, vp]
    in_specs = [
        pl.BlockSpec((wb, 1, N, d), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(3)
    ]
    if with_motion:
        args.append(rel)
        in_specs.append(
            pl.BlockSpec((2, N, N), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    else:
        args.append(jnp.zeros((1, 1), q.dtype))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if with_mask:
        args.append(_pad_windows(mask.astype(jnp.bfloat16), bw_pad))
        in_specs.append(
            pl.BlockSpec((wb, N, N), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    else:
        args.append(jnp.zeros((1, 1), q.dtype))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _kernel, scale=scale, block_windows=wb,
        with_motion=with_motion, with_mask=with_mask,
        # true-f32 MXU passes for f32 activations; TPU DEFAULT would
        # run them single-pass bf16 (see conv_pallas.conv3x3_hcw)
        precision=(jax.lax.Precision.HIGHEST
                   if q.dtype == jnp.float32 else None),
    )
    out_shapes = [
        jax.ShapeDtypeStruct((bw_pad, h, N, d), q.dtype),
        jax.ShapeDtypeStruct((bw_pad, h, N, 2) if with_motion else (1, 1, 1, 1),
                             q.dtype),
    ]
    out_specs = [
        pl.BlockSpec((wb, 1, N, d), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((wb, 1, N, 2), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM)
        if with_motion
        else pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    out, motion = pl.pallas_call(
        kernel,
        grid=(bw_pad // wb, h),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)
    out = out[:BW]
    motion = motion[:BW] if with_motion else None
    return out, motion


def _packed_kernel(q_ref, kv_ref, rel_ref, mask_ref, out_ref,
                   motion_ref, *, scale, block_windows, num_heads,
                   head_dim, with_motion, with_mask, precision):
    """Per head j, ONE window-batched dot_general over the whole block
    ([wb, N, hd] x [wb, N, hd] -> [wb, N, N], batch dim 0) instead of
    the round-3 form's wb separate [N, hd] dots — 8x fewer MXU
    dispatches per head; the softmax/motion math runs on the batched
    [wb, N, N] f32 tensor in VMEM."""
    C = num_heads * head_dim
    for j in range(num_heads):
        lo, hi = j * head_dim, (j + 1) * head_dim
        q = q_ref[:, :, lo:hi]                 # [wb, N, hd]
        k = kv_ref[:, :, lo:hi]
        v = kv_ref[:, :, C + lo : C + hi]
        attn = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        ) * scale                              # [wb, N, N] f32
        if with_mask:
            attn = attn + mask_ref[...].astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1)
        a = attn.astype(kv_ref.dtype)
        out_ref[:, :, lo:hi] = jax.lax.dot_general(
            a, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        ).astype(out_ref.dtype)
        if with_motion:
            mx = jnp.sum(attn * rel_ref[0][None].astype(jnp.float32),
                         axis=-1)
            my = jnp.sum(attn * rel_ref[1][None].astype(jnp.float32),
                         axis=-1)
            motion_ref[:, :, 2 * j : 2 * j + 2] = jnp.stack(
                [mx, my], axis=-1
            ).astype(motion_ref.dtype)


def _packed_forward(q, kv, scale, rel, mask, num_heads,
                    block_windows, interpret):
    """Layout-native fused attention: NO head transposes in or out.

    q:  [BW, N, C]      (head j occupies channels [j*hd, (j+1)*hd))
    kv: [BW, N, 2C]     (k then v, same per-head channel layout)
    Returns out [BW, N, C] and motion [BW, N, 2*h] (channel pairs per
    head) or None. The per-head slicing is done by the BlockSpec index
    maps, so the projections' natural [tokens, channels] layout flows
    straight through the kernel — this is what makes the kernel win at
    the model level (the [B,N,h,d] transposes around the generic form
    cost more than the fusion saved).
    """
    BW, N, C = q.shape
    h = num_heads
    hd = C // h
    with_motion = rel is not None
    with_mask = mask is not None
    # VMEM-adaptive window block: per-window block bytes are
    # ~4*N*C*itemsize (q + kv + out refs) plus ~6*N^2*4 of f32
    # softmax/logit temporaries per batched head dot. The f32 base
    # global-window case (N=144, C=672) overflows the 16 MB scoped
    # budget at wb=8 (measured: 28.1 MB stack ask on v5e) — clamp so
    # block buffers + temps stay ~<=6 MB.
    bpw = 4 * N * C * jnp.dtype(q.dtype).itemsize + 6 * N * N * 4
    wb = max(1, min(block_windows, BW, int(6e6 // max(bpw, 1))))
    bw_pad = ((BW + wb - 1) // wb) * wb
    qp = _pad_windows(q, bw_pad)
    kvp = _pad_windows(kv, bw_pad)
    args = [qp, kvp]
    # blocks cover the FULL channel dim (Mosaic requires the minor dim
    # be 128-divisible or whole); heads are sliced inside the kernel
    in_specs = [
        pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((wb, N, 2 * C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if with_motion:
        args.append(rel)
        in_specs.append(
            pl.BlockSpec((2, N, N), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    else:
        args.append(jnp.zeros((1, 1), q.dtype))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if with_mask:
        args.append(_pad_windows(mask.astype(jnp.bfloat16), bw_pad))
        in_specs.append(
            pl.BlockSpec((wb, N, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    else:
        args.append(jnp.zeros((1, 1), q.dtype))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _packed_kernel, scale=scale, block_windows=wb, num_heads=h,
        head_dim=hd, with_motion=with_motion, with_mask=with_mask,
        precision=(jax.lax.Precision.HIGHEST
                   if q.dtype == jnp.float32 else None),
    )
    out_shapes = [
        jax.ShapeDtypeStruct((bw_pad, N, C), q.dtype),
        jax.ShapeDtypeStruct((bw_pad, N, 2 * h) if with_motion else (1, 1, 1),
                             q.dtype),
    ]
    out_specs = [
        pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((wb, N, 2 * h), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        if with_motion
        else pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    out, motion = pl.pallas_call(
        kernel,
        grid=(bw_pad // wb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)
    out = out[:BW]
    motion = motion[:BW] if with_motion else None
    return out, motion


def _packed_reference(q, kv, scale, rel, mask, num_heads):
    """Pure-jnp packed-layout reference (tests + backward pass)."""
    B, N, C = q.shape
    h = num_heads
    hd = C // h
    qh = q.reshape(B, N, h, hd).transpose(0, 2, 1, 3)
    kh = kv[..., :C].reshape(B, N, h, hd).transpose(0, 2, 1, 3)
    vh = kv[..., C:].reshape(B, N, h, hd).transpose(0, 2, 1, 3)
    out, motion = reference_window_attention(qh, kh, vh, scale, rel, mask)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
    if motion is not None:
        # [B, h, N, 2] -> packed [B, N, 2h] (head-major channel pairs)
        motion = motion.transpose(0, 2, 1, 3).reshape(B, N, 2 * h)
    return out, motion


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 5, 6, 7))
def fused_window_attention_packed(q, kv, scale, rel, mask,
                                  num_heads: int, block_windows: int = 8,
                                  interpret: bool = False):
    return _packed_forward(q, kv, scale, rel, mask, num_heads,
                           block_windows, interpret)


def _packed_fwd_rule(q, kv, scale, rel, mask, num_heads, block_windows,
                     interpret):
    out = _packed_forward(q, kv, scale, rel, mask, num_heads,
                          block_windows, interpret)
    return out, (q, kv, rel, mask)


def _packed_bwd_rule(scale, num_heads, block_windows, interpret,
                     residuals, grads):
    q, kv, rel, mask = residuals
    g_out, g_motion = grads

    def ref(q, kv):
        out, motion = _packed_reference(q, kv, scale, rel, mask, num_heads)
        if motion is None:
            return (out,)
        return (out, motion)

    _, vjp = jax.vjp(ref, q, kv)
    if rel is None:
        dq, dkv = vjp((g_out,))
    else:
        dq, dkv = vjp((g_out, g_motion))
    return dq, dkv, None, None


fused_window_attention_packed.defvjp(_packed_fwd_rule, _packed_bwd_rule)


# ----------------------------------------------------------------------
# Fused transformer-BLOCK kernel (round-5): LayerNorm + q/kv projections
# + cross-frame window swap + attention + output projection + the
# reference's residual-to-norm quirk, in ONE pass over the token map.
#
# The XLA path materializes (per block) x_norm, x_rev, q_p, kv_p, the
# attention out and the proj out in HBM — ~13 C-wide HBM passes over
# the full token map. This kernel reads x twice (once as the q side,
# once as the OTHER frame's kv side, selected by the kv BlockSpec index
# map, so the swapped tensor never exists) and writes y + motion: ~3
# passes. The projections run on [wb*N, C] tiles already resident in
# VMEM. The round-4 trace's dense-matmul (30.4 ms) + LayerNorm (~13 ms)
# buckets are the target (PERF_NOTES round 5).
# ----------------------------------------------------------------------
def _ln(x, g, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y * g.astype(jnp.float32) + b.astype(jnp.float32)


def _block_kernel(x_ref, xs_ref, wq_ref, wkv_ref, wp_ref, bp_ref,
                  g_ref, b_ref, rel_ref, mask_ref, y_ref, motion_ref, *,
                  scale, block_windows, num_heads, head_dim,
                  with_motion, with_mask, precision):
    wb, N, C = x_ref.shape
    dt = x_ref.dtype
    xn = _ln(x_ref[...], g_ref[0], b_ref[0]).astype(dt)     # [wb, N, C]
    xs = _ln(xs_ref[...], g_ref[0], b_ref[0]).astype(dt)
    x2 = xn.reshape(wb * N, C)
    q = jax.lax.dot_general(
        x2, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(dt).reshape(wb, N, C)
    kv = jax.lax.dot_general(
        xs.reshape(wb * N, C), wkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ).astype(dt).reshape(wb, N, 2 * C)
    outs = []
    for j in range(num_heads):
        lo, hi = j * head_dim, (j + 1) * head_dim
        attn = jax.lax.dot_general(
            q[:, :, lo:hi], kv[:, :, lo:hi], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale                                    # [wb, N, N] f32
        if with_mask:
            attn = attn + mask_ref[...].astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1)
        a = attn.astype(dt)
        outs.append(jax.lax.dot_general(
            a, kv[:, :, C + lo : C + hi], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision,
        ))
        if with_motion:
            mx = jnp.sum(attn * rel_ref[0][None].astype(jnp.float32),
                         axis=-1)
            my = jnp.sum(attn * rel_ref[1][None].astype(jnp.float32),
                         axis=-1)
            motion_ref[:, :, 2 * j : 2 * j + 2] = jnp.stack(
                [mx, my], axis=-1
            ).astype(motion_ref.dtype)
    app = jnp.concatenate(outs, axis=-1)             # [wb, N, C] f32
    out = jax.lax.dot_general(
        app.astype(dt).reshape(wb * N, C), wp_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    ) + bp_ref[0].astype(jnp.float32)
    # reference residual quirk: add to norm1(x), not to x
    # (attention.py:320-322)
    y_ref[...] = (
        xn.astype(jnp.float32) + out.reshape(wb, N, C)
    ).astype(y_ref.dtype)


def _block_reference(x, wq, wkv, wproj, bproj, ln_g, ln_b, scale, rel,
                     mask, num_heads, swap_halves):
    """Pure-jnp reference of the fused block (tests + backward)."""
    BW, N, C = x.shape
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mu).mean(-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * ln_g + ln_b).astype(
        x.dtype
    )
    xs = (
        jnp.concatenate([xn[BW // 2 :], xn[: BW // 2]], axis=0)
        if swap_halves else xn
    )
    q = (xn.reshape(-1, C) @ wq.astype(x.dtype)).reshape(BW, N, C)
    kv = (xs.reshape(-1, C) @ wkv.astype(x.dtype)).reshape(BW, N, 2 * C)
    app, motion = _packed_reference(q, kv, scale, rel, mask, num_heads)
    out = (app.reshape(-1, C) @ wproj.astype(x.dtype)).reshape(
        BW, N, C
    ) + bproj.astype(x.dtype)
    return (xn + out).astype(x.dtype), motion


def _block_forward(x, wq, wkv, wproj, bproj, ln_g, ln_b, scale, rel,
                   mask, num_heads, swap_halves, block_windows,
                   interpret):
    BW, N, C = x.shape
    h = num_heads
    hd = C // h
    with_motion = rel is not None
    with_mask = mask is not None
    # VMEM budget per block step: x, xs, xn, xs_n, q, app, y ~ 7*N*C,
    # kv 2 more, plus f32 softmax temps ~6*N^2 and the weights
    # (~5*C^2). Clamp wb to ~6 MB of block buffers; additionally wb
    # must divide BW//2 when swapping so the kv index map lands on the
    # true half boundary.
    item = jnp.dtype(x.dtype).itemsize
    bpw = 11 * N * C * item + 6 * N * N * 4
    budget = int(max(6e6 - 5 * C * C * item, 1e6))
    wb = max(1, min(block_windows, BW, budget // max(bpw, 1)))
    half = BW // 2 if swap_halves else BW
    while wb > 1 and half % wb:
        wb -= 1
    if swap_halves and (BW % 2 or (BW // 2) % wb):
        # unalignable (tiny odd BW): materialize the swap instead
        xs_in = jnp.concatenate([x[BW // 2 :], x[: BW // 2]], axis=0)
        swap_halves = False
    else:
        xs_in = x
    bw_pad = ((BW + wb - 1) // wb) * wb
    xp = _pad_windows(x, bw_pad)
    xsp = _pad_windows(xs_in, bw_pad)
    nb = bw_pad // wb
    half_blocks = (BW // 2) // wb if swap_halves else 0

    if swap_halves:
        # wb | BW/2 here, so bw_pad == BW and every block is real: the
        # kv side of block i is block (i + nb/2) mod nb — the OTHER
        # frame's copy of the same windows, never materialized
        def xs_map(i):
            return (jax.lax.rem(i + half_blocks, nb), 0, 0)
    else:
        def xs_map(i):
            return (i, 0, 0)

    args = [xp, xsp, wq.astype(x.dtype), wkv.astype(x.dtype),
            wproj.astype(x.dtype),
            bproj.reshape(1, -1).astype(x.dtype),
            ln_g.reshape(1, -1).astype(jnp.float32),
            ln_b.reshape(1, -1).astype(jnp.float32)]
    in_specs = [
        pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((wb, N, C), xs_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, 2 * C), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if with_motion:
        args.append(rel)
        in_specs.append(
            pl.BlockSpec((2, N, N), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    else:
        args.append(jnp.zeros((1, 1), x.dtype))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if with_mask:
        args.append(_pad_windows(mask.astype(jnp.bfloat16), bw_pad))
        in_specs.append(
            pl.BlockSpec((wb, N, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    else:
        args.append(jnp.zeros((1, 1), x.dtype))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _block_kernel, scale=scale, block_windows=wb, num_heads=h,
        head_dim=hd, with_motion=with_motion, with_mask=with_mask,
        precision=(jax.lax.Precision.HIGHEST
                   if x.dtype == jnp.float32 else None),
    )
    out_shapes = [
        jax.ShapeDtypeStruct((bw_pad, N, C), x.dtype),
        jax.ShapeDtypeStruct((bw_pad, N, 2 * h) if with_motion
                             else (1, 1, 1), x.dtype),
    ]
    out_specs = [
        pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((wb, N, 2 * h), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        if with_motion
        else pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    y, motion = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)
    y = y[:BW]
    motion = motion[:BW] if with_motion else None
    return y, motion


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 10, 11, 12, 13))
def fused_atm_block(x, wq, wkv, wproj, bproj, ln_g, ln_b, scale, rel,
                    mask, num_heads: int, swap_halves: bool,
                    block_windows: int = 8, interpret: bool = False):
    """Fused transformer block core on packed windows.

    x: [BW, N, C] unnormalized window tokens (BW = 2B*nW for ATM
    blocks, frame halves stacked); returns (y, motion):
    y = norm1(x) + proj(attention(norm1(x), kv-from-swapped-half)) —
    the reference's residual-to-norm form — and motion [BW, N, 2h]
    (None without rel). swap_halves selects the ATM cross-frame kv
    source (attention.py:318-319) without materializing it.
    """
    return _block_forward(x, wq, wkv, wproj, bproj, ln_g, ln_b, scale,
                          rel, mask, num_heads, swap_halves,
                          block_windows, interpret)


def _block_fwd_rule(x, wq, wkv, wproj, bproj, ln_g, ln_b, scale, rel,
                    mask, num_heads, swap_halves, block_windows,
                    interpret):
    out = _block_forward(x, wq, wkv, wproj, bproj, ln_g, ln_b, scale,
                         rel, mask, num_heads, swap_halves,
                         block_windows, interpret)
    return out, (x, wq, wkv, wproj, bproj, ln_g, ln_b, rel, mask)


def _block_bwd_rule(scale, num_heads, swap_halves, block_windows,
                    interpret, residuals, grads):
    x, wq, wkv, wproj, bproj, ln_g, ln_b, rel, mask = residuals
    g_y, g_motion = grads

    def ref(x, wq, wkv, wproj, bproj, ln_g, ln_b):
        y, motion = _block_reference(
            x, wq, wkv, wproj, bproj, ln_g, ln_b, scale, rel, mask,
            num_heads, swap_halves,
        )
        if motion is None:
            return (y,)
        return (y, motion)

    _, vjp = jax.vjp(ref, x, wq, wkv, wproj, bproj, ln_g, ln_b)
    if rel is None:
        gs = vjp((g_y,))
    else:
        gs = vjp((g_y, g_motion))
    return gs + (None, None)


fused_atm_block.defvjp(_block_fwd_rule, _block_bwd_rule)


def _fwd_rule(q, k, v, scale, rel, mask, block_windows, interpret):
    out = _forward(q, k, v, scale, rel, mask, block_windows, interpret)
    return out, (q, k, v, rel, mask)


def _bwd_rule(scale, block_windows, interpret, residuals, grads):
    q, k, v, rel, mask = residuals
    g_out, g_motion = grads

    def ref(q, k, v):
        out, motion = reference_window_attention(q, k, v, scale, rel, mask)
        if motion is None:
            return (out,)
        return (out, motion)

    _, vjp = jax.vjp(ref, q, k, v)
    if rel is None:
        dq, dk, dv = vjp((g_out,))
    else:
        dq, dk, dv = vjp((g_out, g_motion))
    return dq, dk, dv, None, None


fused_window_attention.defvjp(_fwd_rule, _bwd_rule)
