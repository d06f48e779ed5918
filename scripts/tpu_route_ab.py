"""On-TPU exactness A/B for the newly-activated HCW routes at demo shapes.

Round-2 debug probe: demo verify dropped 58.0 -> 50.2 dB after enabling
(a) the encoder first-stage conv pair and (b) the refiner up3 deconv
route in HCW. CPU interpret-mode tests pass, so this checks each op on
real Mosaic at the exact 2560x1088 base-model shapes vs its XLA
equivalent, under one jit per case (relay-safe: data made on device,
scalar readback fence).
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from atmvfi_tpu.ops import conv_pallas as cp
from atmvfi_tpu.ops import deconv_pallas as dp


def conv_case(name, BH, H, cin_true, cout, W, wt=None, prelu=True,
              dtype=jnp.float32):
    cinp = cp.channel_pad(cin_true, dtype)

    def f(key):
        kx, kk, kb, ks = jax.random.split(key, 4)
        x = jax.random.normal(kx, (BH, cinp, W), dtype)
        # zero padded channels like nhwc_to_hcw does
        ch = jax.lax.broadcasted_iota(jnp.int32, (1, cinp, 1), 1)
        x = jnp.where(ch < cin_true, x, 0.0)
        if wt is not None and wt < W:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
            x = jnp.where(lane < wt, x, 0.0)
        k = jax.random.normal(kk, (3, 3, cin_true, cout), jnp.float32) * 0.1
        b = jax.random.normal(kb, (cout,), jnp.float32) * 0.1
        s = jax.random.normal(ks, (cout,), jnp.float32) * 0.1
        y_k = cp.conv3x3_hcw_op(x, k, b, s, H, prelu, False, wt)
        y_x = cp._xla_equiv(x, k, b, s, H, prelu, wt)
        d = jnp.abs(y_k.astype(jnp.float32) - y_x.astype(jnp.float32))
        return jnp.max(d), jnp.mean(d), jnp.max(jnp.abs(y_x))

    mx, mn, ref = jax.jit(f)(jax.random.PRNGKey(0))
    print(f"{name}: max|d|={float(mx):.3e} mean={float(mn):.3e} "
          f"ref_max={float(ref):.3e}", flush=True)


def deconv_case(name, BH, cin_true, cout, w, wt=None, dtype=jnp.float32):
    cinp = cp.channel_pad(cin_true, dtype)

    def f(key):
        kx, kk, kb, ks = jax.random.split(key, 4)
        x = jax.random.normal(kx, (BH, cinp, w), dtype)
        ch = jax.lax.broadcasted_iota(jnp.int32, (1, cinp, 1), 1)
        x = jnp.where(ch < cin_true, x, 0.0)
        if wt is not None and wt < w:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
            x = jnp.where(lane < wt, x, 0.0)
        k = jax.random.normal(kk, (2, 2, cin_true, cout), jnp.float32) * 0.1
        b = jax.random.normal(kb, (cout,), jnp.float32) * 0.1
        s = jax.random.normal(ks, (cout,), jnp.float32) * 0.1
        y_k = dp.deconv2x_hcw_op(x, k, b, s, True, False, wt)
        y_x = dp._xla_equiv(x, k, b, s, True, wt)
        d = jnp.abs(y_k.astype(jnp.float32) - y_x.astype(jnp.float32))
        return jnp.max(d), jnp.mean(d), jnp.max(jnp.abs(y_x))

    mx, mn, ref = jax.jit(f)(jax.random.PRNGKey(1))
    print(f"{name}: max|d|={float(mx):.3e} mean={float(mn):.3e} "
          f"ref_max={float(ref):.3e}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "a"):
        # route (a): encoder first pair at 2560x1088, B=1 -> [2B,H,W,.]
        conv_case("a1 enc conv 3->24  W2560", 2176, 1088, 3, 24, 2560)
        conv_case("a2 enc conv 24->24 W2560", 2176, 1088, 24, 24, 2560)
    if which in ("all", "b"):
        # route (b): refiner up3 deconv + head pair
        deconv_case("b1 up3 deconv 128->64 w1280", 544, 128, 64, 1280)
        conv_case("b2 head conv 128->64 W2560", 1088, 1088, 128, 64, 2560)
        conv_case("b3 head conv 64->3   W2560", 1088, 1088, 64, 3, 2560)
    if which in ("all", "c"):
        # decoder-stage suspects (bisect: dec/pair-only -> 47.9 dB at
        # 768x1280; conv101@2560 ran in the 58-dB verify so plan-dep?)
        conv_case("c1 dec conv 101->101 W1280", 768, 768, 101, 101, 1280)
        conv_case("c2 dec conv 101->101 W2560", 1088, 1088, 101, 101, 2560)
        deconv_case("c3 dec deconv 197->101 w1280", 544, 197, 101, 1280)
        deconv_case("c4 dec deconv 197->101 w640", 384, 197, 101, 640)
    if which in ("all", "d"):
        # chained kernels (model runs pairs/triples; singles all probe
        # exact): conv_a(prelu)->conv_b(no prelu) at the decoder shape,
        # and the full deconv->conv->conv stage triple
        def chain_case(name, BH, H, cin_true, cmid, cout, W,
                       with_deconv=False, dtype=jnp.float32):
            cinp = cp.channel_pad(cin_true, dtype)

            def f(key):
                ks = jax.random.split(key, 8)
                x = jax.random.normal(ks[0], (BH, cinp, W), dtype)
                ch = jax.lax.broadcasted_iota(jnp.int32, (1, cinp, 1), 1)
                x = jnp.where(ch < cin_true, x, 0.0)
                kd = jax.random.normal(
                    ks[1], (2, 2, cin_true, cmid), jnp.float32) * 0.1
                bd = jax.random.normal(ks[2], (cmid,), jnp.float32) * 0.1
                sd = jax.random.normal(ks[3], (cmid,), jnp.float32) * 0.1
                k1 = jax.random.normal(
                    ks[4], (3, 3, (cmid if with_deconv else cin_true),
                            cmid), jnp.float32) * 0.1
                b1 = jax.random.normal(ks[5], (cmid,), jnp.float32) * 0.1
                s1 = jax.random.normal(ks[6], (cmid,), jnp.float32) * 0.1
                k2 = jax.random.normal(
                    ks[7], (3, 3, cmid, cout), jnp.float32) * 0.1
                b2 = jnp.zeros((cout,), jnp.float32)
                z2 = jnp.zeros((cout,), jnp.float32)
                H2 = 2 * H if with_deconv else H
                if with_deconv:
                    y_k = dp.deconv2x_hcw_op(x, kd, bd, sd, True, False)
                    y_x = dp._xla_equiv(x, kd, bd, sd, True)
                else:
                    y_k = y_x = x
                y_k = cp.conv3x3_hcw_op(y_k, k1, b1, s1, H2, True, False)
                y_k = cp.conv3x3_hcw_op(y_k, k2, b2, z2, H2, False, False)
                y_x = cp._xla_equiv(y_x, k1, b1, s1, H2, True)
                y_x = cp._xla_equiv(y_x, k2, b2, z2, H2, False)
                d = jnp.abs(y_k.astype(jnp.float32) - y_x.astype(jnp.float32))
                return jnp.max(d), jnp.mean(d), jnp.max(jnp.abs(y_x))

            mx, mn, ref = jax.jit(f)(jax.random.PRNGKey(3))
            print(f"{name}: max|d|={float(mx):.3e} mean={float(mn):.3e} "
                  f"ref_max={float(ref):.3e}", flush=True)

        chain_case("d1 conv101 pair W1280", 768, 768, 101, 101, 101, 1280)
        chain_case("d2 stage triple w640->1280", 384, 384, 197, 101, 101,
                   640, with_deconv=True)
    if which == "plans":
        # same shape, forced (TW, chunk) plans, to isolate plan deps
        orig = cp._pick_plan
        for tw, chunk in ((256, 4), (256, 2), (256, 1), (128, 4),
                          (640, 1)):
            if 1280 % tw:
                continue
            cp._pick_plan = lambda *a, _p=(tw, chunk): _p
            try:
                conv_case(f"p TW={tw} chunk={chunk} 101ch W1280",
                          768, 768, 101, 101, 1280)
            finally:
                cp._pick_plan = orig
