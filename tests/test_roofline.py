"""Counted-FLOP roofline: known-op counts + model trace smoke."""
import numpy as np

import jax
import jax.numpy as jnp

from atmvfi_tpu.utils.roofline import count_flops, model_roofline


def test_dot_flops_exact():
    a = jax.ShapeDtypeStruct((64, 32), jnp.float32)
    b = jax.ShapeDtypeStruct((32, 48), jnp.float32)
    c = count_flops(lambda x, y: x @ y, a, b)
    assert c["mxu_flops"] == 2 * 64 * 32 * 48


def test_conv_flops_exact():
    x = jax.ShapeDtypeStruct((1, 16, 16, 8), jnp.float32)
    k = jax.ShapeDtypeStruct((3, 3, 8, 24), jnp.float32)

    def f(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    c = count_flops(f, x, k)
    assert c["mxu_flops"] == 2 * (16 * 16 * 24) * 3 * 3 * 8


def test_scan_scales_and_cond_counts_fast_branch():
    x = jax.ShapeDtypeStruct((128, 128), jnp.float32)

    def f(x):
        def body(c, _):
            return c @ c, None
        c, _ = jax.lax.scan(body, x, None, length=5)
        return jax.lax.cond(
            jnp.sum(c) > 0, lambda v: v @ v, lambda v: v, c
        )

    c = count_flops(f, x)
    flop1 = 2 * 128**3
    assert c["mxu_flops"] == 6 * flop1  # 5 scan iters + true branch


def test_pallas_flops_counted_through_grid():
    from jax.experimental import pallas as pl

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(
            a_ref[...], b_ref[...], preferred_element_type=jnp.float32
        )

    def f(a, b):
        return pl.pallas_call(
            kernel,
            grid=(2,),
            in_specs=[
                pl.BlockSpec((64, 64), lambda i: (i, 0)),
                pl.BlockSpec((64, 64), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((64, 64), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((128, 64), jnp.float32),
            interpret=True,
        )(a, b)

    a = jax.ShapeDtypeStruct((128, 64), jnp.float32)
    b = jax.ShapeDtypeStruct((64, 64), jnp.float32)
    c = count_flops(f, a, b)
    assert c["mxu_flops"] == 2 * 2 * 64 * 64 * 64  # grid=2 blocks


def test_counts_recurse_into_jnp_internal_jits():
    """jax 0.9 traces jnp helpers (einsum, take_along_axis) as nested
    `jit` eqns; the walkers must recurse or their dots/gathers vanish
    from the counts (bug found round 3: the XLA warp's gathers were
    invisible to the byte floor)."""
    from atmvfi_tpu.utils.roofline import live_bytes_breakdown

    def f(a, b, idx):
        y = jnp.einsum("ij,jk->ik", a, b)
        return jnp.take_along_axis(y, idx, axis=1)

    a = jax.ShapeDtypeStruct((64, 32), jnp.float32)
    b = jax.ShapeDtypeStruct((32, 48), jnp.float32)
    idx = jax.ShapeDtypeStruct((64, 8), jnp.int32)
    c = count_flops(f, a, b, idx)
    assert c["mxu_flops"] == 2 * 64 * 32 * 48  # the einsum dot
    jaxpr = jax.make_jaxpr(f)(a, b, idx)
    bd = live_bytes_breakdown(jaxpr.jaxpr)
    assert "gather" in bd and bd["gather"] > 0
    assert "dot_general" in bd and bd["dot_general"] > 0


def test_model_roofline_smoke():
    r = model_roofline("lite", H=128, W=384)
    assert r["mxu_tflop"] > 0 and r["hbm_gb_min"] > 0
    assert r["sol_fps"] > 0 and r["bound"] in ("mxu", "vpu", "hbm")
