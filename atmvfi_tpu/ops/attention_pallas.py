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
# fixed dispatch + grid overhead exceeds its layout savings and XLA wins
# (measured round 5, v5e: base 448x256 has 56 local / 12 global windows
# and ran 124.5 fps with the kernel vs 128+ on XLA; 1080p/4K window
# counts are >= 510 and the kernel wins there — PERF_NOTES round 5 A/B).
AUTO_MIN_WINDOWS = 256


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
