"""Fused Pallas attention kernel vs the pure-jnp reference (interpret)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atmvfi_tpu.ops.attention_pallas import (
    fused_window_attention,
    reference_window_attention,
    resolve_attention_impl,
)


def _inputs(seed, BW=5, h=4, N=64, d=32, with_mask=True):
    rng = np.random.default_rng(seed)
    q, k, v = (
        jnp.asarray(rng.standard_normal((BW, h, N, d)), jnp.float32)
        for _ in range(3)
    )
    mask = None
    if with_mask:
        nW = BW  # pre-expanded mask
        m = np.zeros((nW, N, N), np.float32)
        m[:, : N // 2, N // 2 :] = -100.0
        mask = jnp.asarray(m)
    return q, k, v, mask


@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("with_motion", [False, True])
def test_kernel_matches_reference(with_mask, with_motion):
    N, d = 64, 32
    q, k, v, mask = _inputs(0, with_mask=with_mask, N=N, d=d)
    rel = None
    if with_motion:
        from atmvfi_tpu import ops

        rel = ops.relative_coords(8)  # 8x8 window -> N=64
    scale = d**-0.5
    with jax.default_matmul_precision("highest"):
        out, motion = fused_window_attention(
            q, k, v, scale, rel, mask, 2, True  # interpret mode
        )
        want_out, want_motion = reference_window_attention(
            q, k, v, scale, rel, mask
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                               atol=2e-5, rtol=2e-5)
    if with_motion:
        np.testing.assert_allclose(np.asarray(motion), np.asarray(want_motion),
                                   atol=2e-4, rtol=2e-4)
    else:
        assert motion is None


def test_kernel_pads_ragged_window_count():
    # BW=5 not divisible by block 2 -> padded internally, sliced back
    q, k, v, mask = _inputs(1, BW=5, with_mask=False)
    scale = 32**-0.5
    out, _ = fused_window_attention(q, k, v, scale, None, None, 2, True)
    want, _ = reference_window_attention(q, k, v, scale, None, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_custom_vjp_falls_back_to_reference():
    q, k, v, mask = _inputs(2, BW=2, N=16, d=8, with_mask=False)
    scale = 8**-0.5

    def loss_pallas(q, k, v):
        out, _ = fused_window_attention(q, k, v, scale, None, None, 2, True)
        return jnp.sum(out**2)

    def loss_ref(q, k, v):
        out, _ = reference_window_attention(q, k, v, scale, None, None)
        return jnp.sum(out**2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("with_motion", [False, True])
def test_packed_kernel_matches_reference(with_mask, with_motion):
    from atmvfi_tpu.ops.attention_pallas import (
        _packed_reference,
        fused_window_attention_packed,
    )

    rng = np.random.default_rng(5)
    BW, N, C, h = 5, 64, 128, 4
    q = jnp.asarray(rng.standard_normal((BW, N, C)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((BW, N, 2 * C)), jnp.float32)
    mask = None
    if with_mask:
        m = np.zeros((BW, N, N), np.float32)
        m[:, : N // 2, N // 2 :] = -100.0
        mask = jnp.asarray(m)
    rel = None
    if with_motion:
        from atmvfi_tpu import ops

        rel = ops.relative_coords(8)
    scale = (C // h) ** -0.5
    with jax.default_matmul_precision("highest"):
        out, motion = fused_window_attention_packed(
            q, kv, scale, rel, mask, h, 2, True
        )
        want_out, want_motion = _packed_reference(q, kv, scale, rel, mask, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                               atol=2e-5, rtol=2e-5)
    if with_motion:
        np.testing.assert_allclose(np.asarray(motion),
                                   np.asarray(want_motion),
                                   atol=2e-4, rtol=2e-4)


def test_packed_vjp():
    from atmvfi_tpu.ops.attention_pallas import (
        _packed_reference,
        fused_window_attention_packed,
    )

    rng = np.random.default_rng(6)
    BW, N, C, h = 2, 16, 32, 4
    q = jnp.asarray(rng.standard_normal((BW, N, C)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((BW, N, 2 * C)), jnp.float32)
    scale = (C // h) ** -0.5

    def loss_p(q, kv):
        out, _ = fused_window_attention_packed(q, kv, scale, None, None,
                                               h, 2, True)
        return jnp.sum(out**2)

    def loss_r(q, kv):
        out, _ = _packed_reference(q, kv, scale, None, None, h)
        return jnp.sum(out**2)

    gp = jax.grad(loss_p, argnums=(0, 1))(q, kv)
    gr = jax.grad(loss_r, argnums=(0, 1))(q, kv)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_model_forward_with_pallas_attention_matches_xla():
    """Full lite forward with attn_impl=pallas (interpret) == xla path."""
    import dataclasses

    from atmvfi_tpu.models import Network, get_config

    rng = np.random.default_rng(7)
    im0 = jnp.asarray(rng.random((1, 32, 48, 3)), jnp.float32)
    im1 = jnp.asarray(rng.random((1, 32, 48, 3)), jnp.float32)
    cfg_x = dataclasses.replace(get_config("lite"), attention_impl="xla")
    cfg_p = dataclasses.replace(get_config("lite"), attention_impl="pallas")
    net_x = Network(cfg_x)
    net_p = Network(cfg_p)
    variables = jax.jit(
        lambda a, b: net_x.init(jax.random.PRNGKey(0), a, b)
    )(im0, im1)
    with jax.default_matmul_precision("highest"):
        out_x = net_x.apply(variables, im0, im1, global_motion=True)["I_t"]
        out_p = net_p.apply(variables, im0, im1, global_motion=True)["I_t"]
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=5e-5, rtol=5e-5)


def test_resolver():
    assert resolve_attention_impl("xla") == (False, False)
    use, interp = resolve_attention_impl("pallas")
    assert use is True
    auto_use, _ = resolve_attention_impl("auto")
    # auto prefers the packed kernel ON TPU (round-4 batched rewrite);
    # off-TPU (this CI) it stays XLA
    on_tpu = jax.default_backend() == "tpu"
    assert auto_use is on_tpu


# ---- round-5 fused transformer-BLOCK kernel ----

@pytest.mark.parametrize("swap", [False, True])
@pytest.mark.parametrize("with_mask,with_motion", [(False, False),
                                                   (True, True)])
def test_block_kernel_matches_reference(swap, with_mask, with_motion):
    from atmvfi_tpu.ops.attention_pallas import (
        _block_reference,
        fused_atm_block,
    )

    BW, N, C, h = 12, 64, 64, 8
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((BW, N, C)), jnp.float32)
    wq = jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.float32)
    wkv = jnp.asarray(rng.standard_normal((C, 2 * C)) * 0.05, jnp.float32)
    wp = jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.float32)
    bp = jnp.asarray(rng.standard_normal((C,)) * 0.05, jnp.float32)
    g = jnp.asarray(1 + 0.1 * rng.standard_normal((C,)), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal((C,)), jnp.float32)
    rel = None
    mask = None
    if with_motion:
        from atmvfi_tpu import ops

        rel = ops.relative_coords(8)
    if with_mask:
        # realistic 0/-100 additive mask (bf16-exact, like the shift
        # masks; the kernel stores masks bf16)
        mask = jnp.asarray(
            -100.0 * (rng.random((BW, N, N)) < 0.3), jnp.float32
        )
    scale = (C // h) ** -0.5
    y, m = fused_atm_block(x, wq, wkv, wp, bp, g, b, scale, rel, mask,
                           h, swap, 8, True)
    yr, mr = _block_reference(x, wq, wkv, wp, bp, g, b, scale, rel,
                              mask, h, swap)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               atol=2e-5, rtol=2e-5)
    if with_motion:
        np.testing.assert_allclose(np.asarray(m), np.asarray(mr),
                                   atol=2e-5, rtol=2e-5)


def test_block_kernel_vjp():
    from atmvfi_tpu.ops.attention_pallas import (
        _block_reference,
        fused_atm_block,
    )
    from atmvfi_tpu import ops

    BW, N, C, h = 8, 64, 64, 8
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((BW, N, C)), jnp.float32)
    ws = [jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
          for s in ((C, C), (C, 2 * C), (C, C), (C,), (C,), (C,))]
    rel = ops.relative_coords(8)
    scale = (C // h) ** -0.5

    def loss_k(x, *a):
        y, m = fused_atm_block(x, *a, scale, rel, None, h, True, 8, True)
        return (y ** 2).mean() + (m ** 2).mean()

    def loss_r(x, *a):
        y, m = _block_reference(x, *a, scale, rel, None, h, True)
        return (y ** 2).mean() + (m ** 2).mean()

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(x, *ws)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, *ws)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, rtol=1e-4)


def test_model_forward_with_block_kernel_matches_xla():
    """Full lite forward, attn_impl='pallas_block' (interpret) vs 'xla'
    — also proves the param tree is identical across modes (the same
    variables apply to both)."""
    import dataclasses

    from atmvfi_tpu.models import Network, get_config

    cfg_x = dataclasses.replace(get_config("lite"), attention_impl="xla")
    cfg_b = dataclasses.replace(get_config("lite"),
                                attention_impl="pallas_block")
    H, W = 128, 192
    rng = np.random.default_rng(9)
    im0 = jnp.asarray(rng.random((1, H, W, 3), np.float32))
    im1 = jnp.asarray(rng.random((1, H, W, 3), np.float32))
    net_x, net_b = Network(cfg_x), Network(cfg_b)
    variables = net_x.init(jax.random.PRNGKey(0), im0, im1)
    v2 = net_b.init(jax.random.PRNGKey(0), im0, im1)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))
    out_x = net_x.apply(variables, im0, im1, global_motion=True)["I_t"]
    out_b = net_b.apply(variables, im0, im1, global_motion=True)["I_t"]
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_x),
                               atol=5e-5, rtol=5e-5)
