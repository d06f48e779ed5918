"""Model building blocks (flax.linen, NHWC, static shapes).

Functional re-design of the reference blocks
(/root/reference/network/attention.py, network_base.py:20-32):

  * Attention masks, shift masks and relative-coordinate tensors are
    static trace-time constants (ops.window) instead of the reference's
    mutable `register_buffer` caches.
  * The ConvTranspose(k=2, s=2) decoders are expressed as a matmul +
    depth-to-space, which maps directly onto the MXU.
  * Compute dtype is configurable (bf16 on TPU); softmax and layer
    norms accumulate in f32.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from atmvfi_tpu import ops
from atmvfi_tpu.models.initializers import (
    msra_conv_init,
    prelu_init,
    torch_conv_bias_init,
    torch_conv_kernel_init,
    trunc_normal_init,
)

LN_EPS = 1e-5  # torch nn.LayerNorm default


def gelu(x):
    return jax.nn.gelu(x, approximate=False)  # torch nn.GELU default (erf)


def prelu(x, alpha):
    # max/min arithmetic form (== where(x>=0, x, a*x) for every alpha);
    # plain arithmetic fuses into surrounding conv epilogues better than
    # a predicated select on TPU.
    alpha = alpha.astype(x.dtype)
    return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


class ConvParams(nn.Module):
    """Bare conv kernel+bias holder — same param tree as nn.Conv
    ({"kernel", "bias"}), so checkpoints/converters are unaffected while
    the COMPUTE can be routed to either lax.conv or the Pallas HCW
    kernel (ops/conv_pallas.py)."""

    features: int
    in_features: int
    kernel: int
    fan_in: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", torch_conv_kernel_init(),
            (self.kernel, self.kernel, self.in_features, self.features),
        )
        b = self.param("bias", torch_conv_bias_init(self.fan_in),
                       (self.features,))
        return k, b


class ConvPReLU(nn.Module):
    """conv3x3 + PReLU helper (reference `conv`, network_base.py:20-25).

    `__call__(x)` is the NHWC XLA path. `__call__(x, hcw_h=H)` takes
    HCW activations [B*H, Cpad8, W] and runs the fused Pallas
    conv+bias+PReLU kernel (stride/dilation 1 only) — used for the
    full-resolution decoder/refiner runs where XLA's conv-boundary
    layout copies dominate (PERF_NOTES.md).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hcw: Optional[tuple] = None,
                 interpret: bool = False,
                 planes: Optional[jnp.ndarray] = None,
                 cf_true: Optional[int] = None,
                 params_only: bool = False):
        """NHWC XLA path by default. With `hcw=(cin_true, H)` (static),
        x is HCW [B*H, pad8(cin_true), W] and the fused Pallas
        conv+bias+PReLU kernel runs (stride/dilation 1 only); padded
        channels stay exactly zero (pack_conv3x3_weights_padded).

        With `planes` ([NP, B*H, W] planar image stack) additionally
        given, the input channel space is [HCW feat ‖ planes] and the
        planes DMA straight into the kernel's slab (the refiner proj's
        full-res image inputs never pay an NHWC->HCW transpose);
        cf_true is the number of true feat channels, hcw[0] the TOTAL
        true cin (feat + planes).

        params_only=True just materializes (k, b, prelu_slope) with the
        identical param tree and returns them — used by the fused
        conv-pair route, where the PARENT passes both convs' params to
        one kernel (conv3x3_pair_hcw_op)."""
        from atmvfi_tpu.ops import conv_pallas as cp

        cin = hcw[0] if hcw is not None else x.shape[-1]
        fan_in = self.kernel * self.kernel * cin
        k, b = ConvParams(
            self.features, cin, self.kernel, fan_in, name="conv"
        )()
        alpha = self.param("prelu", prelu_init, (self.features,))
        if params_only:
            return k, b, alpha
        if hcw is not None:
            assert (
                self.kernel == 3 and self.stride in (1, 2)
                and self.dilation == 1
            )
            wt = hcw[2] if len(hcw) > 2 else None
            if self.stride == 2:
                # encoder downsampling stages; hcw[1] is H_OUT here
                assert planes is None
                return cp.conv3x3s2_hcw_op(
                    x.astype(self.dtype), k, b, alpha, hcw[1], True,
                    interpret, wt,
                )
            if planes is not None and x is None:
                # planes-only form (encoder first conv: raw frames)
                return cp.conv3x3_planes_only_op(
                    planes.astype(self.dtype), k, b, alpha, hcw[1], True,
                    interpret, wt,
                )
            if planes is not None:
                return cp.conv3x3_hcw_planes_op(
                    x.astype(self.dtype), planes, k, b, alpha, hcw[1],
                    cf_true, True, interpret, wt,
                )
            return cp.conv3x3_hcw_op(
                x.astype(self.dtype), k, b, alpha, hcw[1], True, interpret,
                wt,
            )
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(self.dtype)
        return prelu(x, alpha)


class PlainConv(nn.Module):
    """conv (no activation) with the same param tree as a bare nn.Conv
    ({"kernel", "bias"}); supports the Pallas HCW path like ConvPReLU."""

    features: int
    in_features: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hcw: Optional[tuple] = None,
                 interpret: bool = False, params_only: bool = False):
        from atmvfi_tpu.ops import conv_pallas as cp

        fan_in = self.kernel * self.kernel * self.in_features
        k = self.param(
            "kernel", torch_conv_kernel_init(),
            (self.kernel, self.kernel, self.in_features, self.features),
        )
        b = self.param("bias", torch_conv_bias_init(fan_in),
                       (self.features,))
        if params_only:
            return k, b, None
        if hcw is not None:
            assert self.kernel == 3
            wt = hcw[2] if len(hcw) > 2 else None
            return cp.conv3x3_hcw_op(
                x.astype(self.dtype), k, b, jnp.zeros_like(b), hcw[1],
                False, interpret, wt,
            )
        pad = self.kernel // 2
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), k.astype(self.dtype),
            window_strides=(1, 1), padding=[(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(self.dtype)


class Deconv2x(nn.Module):
    """ConvTranspose(k=2, s=2) + PReLU.

    Exact parity with the reference `deconv` at its only used config
    (kernel 2, stride 2, padding 0 — network_base.py:202, 243-255):
    out[2h+dy, 2w+dx, o] = sum_i x[h, w, i] * K[dy, dx, i, o] + b[o].
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    with_prelu: bool = True

    @nn.compact
    def __call__(self, x, hcw: Optional[tuple] = None,
                 interpret: bool = False):
        """NHWC XLA path by default. With `hcw=(cin_true,)` (static), x
        is HCW [B*h, pad(cin_true), w] and the Pallas deconv kernel
        (ops/deconv_pallas.py) emits full-res HCW directly — the entry
        op of the decoder stages' HCW conv runs."""
        from atmvfi_tpu.ops import deconv_pallas as dp

        C = hcw[0] if hcw is not None else x.shape[-1]
        kernel = self.param(
            "kernel", torch_conv_kernel_init(), (2, 2, C, self.features)
        )
        bias = self.param("bias", torch_conv_bias_init(4 * C), (self.features,))
        alpha = (
            self.param("prelu", prelu_init, (self.features,))
            if self.with_prelu else None
        )
        if hcw is not None:
            wt = hcw[1] if len(hcw) > 1 else None
            return dp.deconv2x_hcw_op(
                x.astype(self.dtype), kernel, bias,
                alpha if alpha is not None else jnp.zeros_like(bias),
                self.with_prelu, interpret, wt,
            )
        # lax.conv_transpose correlates with the unflipped kernel; flip
        # spatially to get scatter semantics out[2h+dy] += x[h]*K[dy]
        # (torch ConvTranspose2d parity, verified to 5e-7).
        y = jax.lax.conv_transpose(
            x.astype(self.dtype),
            kernel[::-1, ::-1].astype(self.dtype),
            strides=(2, 2),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + bias.astype(self.dtype)
        if self.with_prelu:
            y = prelu(y, alpha)
        return y


class PReLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("prelu", prelu_init, (self.features,))
        return prelu(x, alpha)


class _DWConvParams(nn.Module):
    """Param holder with nn.Conv's exact tree ({kernel, bias}, kernel
    [3, 3, 1, dim]) so checkpoints/converters are unaffected by the
    compute reformulation below."""

    dim: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", msra_conv_init(9), (3, 3, 1, self.dim))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return k, b


class DWConv(nn.Module):
    """3x3 depthwise conv inside the transformer MLP (attention.py:74-85).

    Computed as 9 shifted multiply-adds instead of a grouped
    `lax.conv`: TPU lowers depthwise convolutions into degenerate
    1-input-channel MXU passes — the round-4 lite-4K trace put the
    model's 6 MLP depthwise convs inside the 48 ms flax-conv bucket.
    The shifted-add form is pure VPU elementwise work that XLA fuses
    with the surrounding GELU/dense ops. Padding='zeros' semantics and
    the nn.Conv param tree are preserved exactly.
    """

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        k, b = _DWConvParams(self.dim, name="dwconv")()
        dt = self.dtype
        xv = x.astype(dt)
        kv = k.astype(dt)
        B, H, W, C = x.shape
        xp = jnp.pad(xv, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                t = xp[:, dy : dy + H, dx : dx + W, :] * kv[dy, dx, 0]
                acc = t if acc is None else acc + t
        return acc + b.astype(dt)


class Mlp(nn.Module):
    """fc1 -> dwconv -> GELU -> fc2 (attention.py:88-123)."""

    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        dense = lambda f, name: nn.Dense(
            f, kernel_init=trunc_normal_init(), dtype=self.dtype, name=name
        )
        x = dense(self.hidden, "fc1")(x)
        x = DWConv(self.hidden, dtype=self.dtype, name="dwconv")(x)
        x = gelu(x)
        x = dense(self.dim, "fc2")(x)
        return x


def attention_probs(q, k, scale, mask: Optional[jnp.ndarray],
                    out_dtype: Optional[jnp.dtype] = None):
    """Masked softmax attention probabilities (f32 compute).

    q, k: [B, heads, N, hd]; mask: [nW, N, N] additive or None. Batch is
    ordered (img, window) flattened, matching window_partition, so the
    mask broadcast reproduces attention.py:194-198.

    out_dtype: storage dtype of the returned probabilities (logits/
    softmax math always runs f32). MEASURED NEGATIVE (v5e 2026-08-20):
    casting the result to bf16 moved lite-4K 373.5 -> 375.0 ms/frame
    and base-1080p 148.4 -> 149.7 — i.e. the round-3 trace's 36.9 ms
    "softmax materialization" bucket is exp/reduce COMPUTE (VPU), not
    HBM bandwidth, so halving the stored bytes buys nothing and adds a
    convert. Callers therefore pass None (f32 probabilities, as
    before); the parameter stays for future A/Bs.
    """
    attn = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        nW, N, _ = mask.shape
        h = attn.shape[1]
        attn = attn.reshape(-1, nW, h, N, N) + mask[None, :, None]
        attn = attn.reshape(-1, h, N, N)
    p = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
    return p if out_dtype is None else p.astype(out_dtype)


class _DenseParams(nn.Module):
    """Param holder with nn.Dense's exact tree ({kernel[, bias]}) so
    the fused-block kernel path binds the same checkpoint weights as
    the module path."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", trunc_normal_init(),
                       (self.in_features, self.features))
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        return k, b


class _LNParams(nn.Module):
    """Param holder with nn.LayerNorm's exact tree ({scale, bias})."""

    features: int

    @nn.compact
    def __call__(self):
        g = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return g, b


class AttentionToMotion(nn.Module):
    """Cross-frame window attention emitting appearance + motion.

    The core ATM op (attention.py:126-213): appearance = attn @ v;
    motion = per-head expected in-window displacement
    sum_k attn[q,k] * (coord_k - coord_q), reduced over heads by a tiny
    shared MLP per direction. On TPU the probability tensor never hits
    HBM: the fused Pallas kernel (ops/attention_pallas.py) emits both
    outputs in one pass. With `block_ln` (the parent's norm1 params),
    the round-5 BLOCK kernel additionally folds the LayerNorm, the
    q/kv/proj projections, the cross-frame batch-half swap (kv BlockSpec
    index map) and the residual-to-norm add into the same pass; x1 is
    then the UNnormalized window tokens and the first return value is
    `norm1(x) + proj(attn_out)`.
    """

    dim: int
    window_size: int
    num_heads: int = 8
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x1, x2, mask=None, block_ln=None,
                 interpret: bool = False):
        from atmvfi_tpu.ops.attention_pallas import (
            fused_atm_block,
            fused_window_attention_packed,
            resolve_attention_impl,
        )

        B, N, C = x1.shape
        h = self.num_heads
        hd = C // h
        scale = hd**-0.5
        dense = lambda f, name, bias=True: nn.Dense(
            f, use_bias=bias, kernel_init=trunc_normal_init(), dtype=self.dtype, name=name
        )
        rel_f = ops.relative_coords(self.window_size)  # [2, N, N] f32
        if block_ln is not None:
            assert not self.qkv_bias, "block kernel assumes bias-free q/kv"
            wq, _ = _DenseParams(C, C, self.qkv_bias, name="q")()
            wkv, _ = _DenseParams(C, 2 * C, self.qkv_bias, name="kv")()
            wp, bp = _DenseParams(C, C, True, name="proj")()
            mask_exp = (
                None if mask is None
                else jnp.tile(mask, (B // mask.shape[0], 1, 1))
            )
            y, motion_p = fused_atm_block(
                x1.astype(self.dtype), wq, wkv, wp, bp,
                block_ln[0], block_ln[1], scale, rel_f, mask_exp,
                h, True, 8, interpret,
            )
            motion = motion_p.astype(self.dtype).reshape(B, N, h, 2)
            motion = motion.transpose(0, 3, 1, 2)  # [B, 2, N, h]
            m = dense(h // 2, "mlp_fc1")(motion)
            m = gelu(m)
            m = dense(1, "mlp_fc2")(m)  # [B, 2, N, 1]
            return y, m[..., 0].transpose(0, 2, 1)

        q_p = dense(C, "q", self.qkv_bias)(x1)
        kv_p = dense(2 * C, "kv", self.qkv_bias)(x2)

        rel = rel_f
        use_pallas, interpret = resolve_attention_impl(self.attn_impl, B)
        if use_pallas:
            # layout-native kernel: per-head slicing happens in the
            # BlockSpec index maps, no [B,N,h,d] transposes
            mask_exp = (
                None if mask is None
                else jnp.tile(mask, (B // mask.shape[0], 1, 1))
            )
            out, motion_p = fused_window_attention_packed(
                q_p, kv_p, scale, rel, mask_exp, h, 8, interpret
            )
            motion = motion_p.astype(self.dtype).reshape(B, N, h, 2)
            motion = motion.transpose(0, 3, 1, 2)  # [B, 2, N, h]
        else:
            q = q_p.reshape(B, N, h, hd).transpose(0, 2, 1, 3)
            kv = kv_p.reshape(B, N, 2, h, hd)
            k = kv[:, :, 0].transpose(0, 2, 1, 3)
            v = kv[:, :, 1].transpose(0, 2, 1, 3)
            attn = attention_probs(q, k, scale, mask)  # f32 [B, h, N, N]
            out = jnp.einsum("bhqk,bhkd->bqhd", attn.astype(self.dtype), v)
            out = out.reshape(B, N, C)
            motion = jnp.einsum("bhqk,dqk->bdqh", attn, rel)  # [B,2,N,h] f32
            motion = motion.astype(self.dtype)
        out = dense(C, "proj")(out)
        m = dense(h // 2, "mlp_fc1")(motion)
        m = gelu(m)
        m = dense(1, "mlp_fc2")(m)  # [B, 2, N, 1]
        motion = m[..., 0].transpose(0, 2, 1)  # [B, N, 2] (dx, dy)
        return out, motion


class WindowAttention(nn.Module):
    """Plain self window attention (attention.py:337-390)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, mask=None, block_ln=None,
                 interpret: bool = False):
        from atmvfi_tpu.ops.attention_pallas import (
            fused_atm_block,
            fused_window_attention_packed,
            resolve_attention_impl,
        )

        B, N, C = x.shape
        h = self.num_heads
        hd = C // h
        scale = hd**-0.5
        dense = lambda f, name, bias=True: nn.Dense(
            f, use_bias=bias, kernel_init=trunc_normal_init(), dtype=self.dtype, name=name
        )
        if block_ln is not None:
            assert not self.qkv_bias, "block kernel assumes bias-free qkv"
            wqkv, _ = _DenseParams(C, 3 * C, self.qkv_bias, name="qkv")()
            wp, bp = _DenseParams(C, C, True, name="proj")()
            mask_exp = (
                None if mask is None
                else jnp.tile(mask, (B // mask.shape[0], 1, 1))
            )
            y, _ = fused_atm_block(
                x.astype(self.dtype), wqkv[:, :C], wqkv[:, C:], wp, bp,
                block_ln[0], block_ln[1], scale, None, mask_exp,
                h, False, 8, interpret,
            )
            return y
        qkv_p = dense(3 * C, "qkv", self.qkv_bias)(x)
        use_pallas, interpret = resolve_attention_impl(self.attn_impl, B)
        if use_pallas:
            mask_exp = (
                None if mask is None
                else jnp.tile(mask, (B // mask.shape[0], 1, 1))
            )
            out, _ = fused_window_attention_packed(
                qkv_p[..., :C], qkv_p[..., C:], scale, None, mask_exp,
                h, 8, interpret,
            )
            return dense(C, "proj")(out)
        qkv = qkv_p.reshape(B, N, 3, h, hd)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        attn = attention_probs(q, k, scale, mask)
        out = jnp.einsum("bhqk,bhkd->bqhd", attn.astype(self.dtype), v)
        return dense(C, "proj")(out.reshape(B, N, C))


class _SwinShell(nn.Module):
    """Shared pad/shift/partition scaffolding for the two block types."""

    window_size: int = 8
    shift_size: int = 0

    def _prologue(self, x):
        _, H, W, _ = x.shape
        ws = (self.window_size, self.window_size)
        ss = (self.shift_size, self.shift_size)
        mask = ops.attn_mask_for(H, W, ws, ss)
        x_pad = ops.center_pad(x, ws)
        if self.shift_size:
            x_pad = jnp.roll(x_pad, (-ss[0], -ss[1]), axis=(1, 2))
        return x_pad, mask

    def _epilogue(self, windows, Hp, Wp, H, W):
        ws = (self.window_size, self.window_size)
        back = ops.window_reverse(windows, ws, Hp, Wp)
        if self.shift_size:
            back = jnp.roll(back, (self.shift_size, self.shift_size), axis=(1, 2))
        return ops.center_depad(back, H, W, ws)


class ATMFormer(_SwinShell):
    """Swin-style block around AttentionToMotion (attention.py:216-334).

    Input/output are [2B, H, W, C] with the two frames stacked on the
    batch axis; also returns the per-pixel bidirectional motion seed
    [2B, H, W, 2]. NOTE the reference's residual quirk: the attention
    residual is added to norm1(x), not to x (attention.py:320-322) —
    reproduced faithfully.
    """

    dim: int = 0
    num_heads: int = 8
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        from atmvfi_tpu.ops.attention_pallas import (
            resolve_attention_block_mode,
        )

        B2, H, W, C = x.shape
        x_pad, mask = self._prologue(x)
        Hp, Wp = x_pad.shape[1], x_pad.shape[2]
        x_win = ops.window_partition(x_pad, (self.window_size, self.window_size))
        nwB = x_win.shape[0]
        mode, interp = resolve_attention_block_mode(self.attn_impl, nwB)
        attn_mod = AttentionToMotion(
            self.dim,
            self.window_size,
            num_heads=self.num_heads,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="attn",
        )
        if mode == "block":
            # norm1 + q/kv/proj + frame swap + residual fused into the
            # block kernel; this module only materializes norm1's params
            g, b = _LNParams(C, name="norm1")()
            x_norm, motion = attn_mod(
                x_win, None, mask, block_ln=(g, b), interpret=interp
            )
        else:
            x_norm = nn.LayerNorm(
                epsilon=LN_EPS, dtype=self.dtype, name="norm1"
            )(x_win)
            x_rev = jnp.concatenate(
                [x_norm[nwB // 2 :], x_norm[: nwB // 2]], axis=0
            )
            app, motion = attn_mod(x_norm, x_rev, mask)
            x_norm = x_norm + app

        x_out = self._epilogue(x_norm, Hp, Wp, H, W)
        motion_out = self._epilogue(motion, Hp, Wp, H, W)

        y = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(x_out)
        x_out = x_out + Mlp(
            self.dim, int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp"
        )(y)
        return x_out, motion_out


class RefineBottleneck(_SwinShell):
    """Swin block around plain WindowAttention (attention.py:393-495)."""

    dim: int = 0
    num_heads: int = 8
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x):  # [B, H, W, C] -> [B, H, W, C]
        from atmvfi_tpu.ops.attention_pallas import (
            resolve_attention_block_mode,
        )

        B, H, W, C = x.shape
        x_pad, mask = self._prologue(x)
        Hp, Wp = x_pad.shape[1], x_pad.shape[2]
        x_win = ops.window_partition(x_pad, (self.window_size, self.window_size))
        mode, interp = resolve_attention_block_mode(
            self.attn_impl, x_win.shape[0]
        )
        attn_mod = WindowAttention(
            self.dim, num_heads=self.num_heads, dtype=self.dtype,
            attn_impl=self.attn_impl, name="attn",
        )
        if mode == "block":
            g, b = _LNParams(C, name="norm1")()
            x_norm = attn_mod(x_win, mask, block_ln=(g, b),
                              interpret=interp)
        else:
            x_norm = nn.LayerNorm(
                epsilon=LN_EPS, dtype=self.dtype, name="norm1"
            )(x_win)
            app = attn_mod(x_norm, mask)
            x_norm = x_norm + app
        x_out = self._epilogue(x_norm, Hp, Wp, H, W)
        y = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(x_out)
        x_out = x_out + Mlp(
            self.dim, int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp"
        )(y)
        return x_out
