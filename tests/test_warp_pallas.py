"""Tile-slab warp kernel vs golden XLA warp (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atmvfi_tpu.ops import warp as warp_xla
from atmvfi_tpu.ops.resize import resize_bilinear
from atmvfi_tpu.ops.warp_pallas import (
    flow_warp_dispatch,
    flow_warp_tiled,
    flow_warp_tiled_nhwc,
    resolve_warp_impl,
)


def _smooth_flow(B, H, W, mag, seed=0):
    r = np.random.default_rng(seed)
    coarse = r.standard_normal(
        (B, max(H // 64, 1), max(W // 64, 1), 2)
    ).astype(np.float32) * mag
    return resize_bilinear(jnp.asarray(coarse), H, W)


@pytest.mark.parametrize(
    "name,B,H,W,C,mag",
    [
        ("smooth", 1, 64, 384, 3, 4.0),
        ("edges", 1, 64, 384, 3, 30.0),  # pushes taps off-image
        ("batch", 2, 64, 384, 2, 3.0),
    ],
)
def test_tiled_matches_xla(name, B, H, W, C, mag):
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    flow = _smooth_flow(B, H, W, mag, seed=hash(name) % 100)
    got = flow_warp_tiled(feat, flow, slab_rows=64, interpret=True)
    want = warp_xla.flow_warp(feat, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize(
    "name,B,H,W,C,mag",
    [
        ("smooth", 1, 64, 384, 3, 4.0),
        ("edges", 1, 64, 384, 3, 30.0),  # taps off-image + negative t
        ("batch", 2, 64, 384, 2, 3.0),   # cross-image rows in B*H space
        ("big", 1, 128, 512, 3, 9.0),
    ],
)
def test_tiled_v2_matches_xla(name, B, H, W, C, mag):
    """Span-loop (v2) kernel: dynamic-trip-count inner loop, modular
    whole-slab rolls. Bit-compatible with ops.warp semantics."""
    rng = np.random.default_rng(2)
    feat = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    flow = _smooth_flow(B, H, W, mag, seed=hash(name) % 100)
    got = flow_warp_tiled(feat, flow, slab_rows=64, interpret=True,
                          inner="span")
    want = warp_xla.flow_warp(feat, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_tiled_v2_fallback_on_rough_flow():
    rng = np.random.default_rng(3)
    feat = jnp.asarray(rng.random((1, 128, 384, 3)), jnp.float32)
    flow = jnp.asarray(
        rng.standard_normal((1, 128, 384, 2)) * 200.0, jnp.float32
    )  # spread far beyond the slab -> exactness cond takes the XLA path
    got = flow_warp_tiled(feat, flow, interpret=True, inner="span")
    want = warp_xla.flow_warp(feat, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize(
    "name,B,H,W,C,mag",
    [
        ("smooth", 1, 64, 384, 3, 4.0),
        ("edges", 1, 64, 384, 3, 30.0),  # taps off-image + negative t
        ("batch", 2, 64, 384, 2, 3.0),   # cross-image rows in B*H space
        ("big", 1, 128, 512, 3, 9.0),
        ("rough", 1, 128, 384, 3, 55.0),  # spans near the slab edge
    ],
)
def test_tiled_v3_matches_xla(name, B, H, W, C, mag):
    """Windowed span-loop (v3, the 'auto' kernel): 16-row dynamic
    window loads + per-row weight folding. Bit-compatible with
    ops.warp semantics (device-measured max|d| = 0.0 at 4K)."""
    rng = np.random.default_rng(4)
    feat = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    flow = _smooth_flow(B, H, W, mag, seed=hash(name) % 100)
    got = flow_warp_tiled(feat, flow, slab_rows=64, interpret=True,
                          inner="win")
    want = warp_xla.flow_warp(feat, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_planar_pair_srcfull_matches_sliced_full_warp():
    """Source-offset warp pair (spatial sharding): slab rows against
    the corresponding rows of a full-frame warp, kernel + XLA impls,
    interior and boundary slabs, plus the huge-flow cond fallback."""
    from atmvfi_tpu.ops.warp_pallas import (
        nhwc_to_planar,
        planar_warp_pair_srcfull,
    )

    rng = np.random.default_rng(5)
    H, W, C = 128, 384, 3
    img0 = jnp.asarray(rng.random((1, H, W, C)), jnp.float32)
    img1 = jnp.asarray(rng.random((1, H, W, C)), jnp.float32)
    fl0 = jnp.asarray((rng.random((1, H, W, 2)) - 0.5) * 30, jnp.float32)
    fl1 = jnp.asarray((rng.random((1, H, W, 2)) - 0.5) * 30, jnp.float32)
    ref0 = warp_xla.flow_warp(img0, fl0)
    ref1 = warp_xla.flow_warp(img1, fl1)
    p0, p1 = nhwc_to_planar(img0), nhwc_to_planar(img1)
    for r0 in (0, 32, 64):
        for impl in ("tiled_v3", "xla"):
            o0, o1 = jax.jit(
                lambda a, b, c, d, r, impl=impl:
                planar_warp_pair_srcfull(a, b, c, d, r, impl=impl)
            )(p0, p1, fl0[:, r0:r0 + 64], fl1[:, r0:r0 + 64],
              jnp.int32(r0))
            np.testing.assert_allclose(
                np.asarray(o0),
                np.asarray(nhwc_to_planar(ref0[:, r0:r0 + 64])),
                atol=2e-5,
            )
            np.testing.assert_allclose(
                np.asarray(o1),
                np.asarray(nhwc_to_planar(ref1[:, r0:r0 + 64])),
                atol=2e-5,
            )
    # flows beyond the slab budget -> cond fallback, still exact
    big0 = fl0 * 10
    o0, _ = jax.jit(
        lambda a, b, c, d, r: planar_warp_pair_srcfull(
            a, b, c, d, r, impl="tiled_v3")
    )(p0, p1, big0[:, 32:96], big0[:, 32:96], jnp.int32(32))
    want = nhwc_to_planar(warp_xla.flow_warp(img0, big0)[:, 32:96])
    np.testing.assert_allclose(np.asarray(o0), np.asarray(want),
                               atol=2e-5)


@pytest.mark.parametrize(
    "name,B,H,W,C,mag",
    [
        ("smooth", 1, 64, 384, 3, 4.0),
        ("edges", 1, 64, 384, 3, 30.0),  # pushes taps off-image
        ("batch", 2, 64, 384, 2, 3.0),
        ("c1", 1, 64, 512, 1, 5.0),      # flow-like single channel
        ("c4", 1, 64, 384, 4, 3.0),
        ("spread", 1, 96, 384, 3, 80.0),  # exceeds slab -> cond fallback
    ],
)
def test_tiled_nhwc_matches_xla(name, B, H, W, C, mag):
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    flow = _smooth_flow(B, H, W, mag, seed=hash(name) % 100)
    got = flow_warp_tiled_nhwc(feat, flow, interpret=True)
    want = warp_xla.flow_warp(feat, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("impl", ["tiled", "tiled_nhwc"])
def test_tiled_gradients_match_xla(impl):
    rng = np.random.default_rng(7)
    feat = jnp.asarray(rng.random((1, 64, 384, 3)), jnp.float32)
    flow = _smooth_flow(1, 64, 384, 3.0, seed=9)

    def loss_tiled(f, fl):
        return jnp.sum(flow_warp_dispatch(f, fl, impl=impl) ** 2)

    def loss_xla(f, fl):
        return jnp.sum(warp_xla.flow_warp(f, fl) ** 2)

    gf_t, gl_t = jax.grad(loss_tiled, argnums=(0, 1))(feat, flow)
    gf_x, gl_x = jax.grad(loss_xla, argnums=(0, 1))(feat, flow)
    np.testing.assert_allclose(np.asarray(gf_t), np.asarray(gf_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gl_t), np.asarray(gl_x), atol=1e-3)


def test_small_inputs_fall_back():
    rng = np.random.default_rng(2)
    feat = jnp.asarray(rng.random((1, 16, 24, 3)), jnp.float32)
    flow = jnp.zeros((1, 16, 24, 2), jnp.float32)
    out = flow_warp_tiled(feat, flow, interpret=True)  # W < 384 -> XLA
    np.testing.assert_allclose(np.asarray(out), np.asarray(feat), atol=1e-6)


def test_resolver():
    assert resolve_warp_impl("xla", 3) == ("xla", False)
    kernel, interp = resolve_warp_impl("tiled", 3)
    assert kernel == "chw"
    assert resolve_warp_impl("tiled_nhwc", 3)[0] == "nhwc"
    assert resolve_warp_impl("tiled_v2", 3)[0] == "chw_v2"
    assert resolve_warp_impl("tiled_v2_unchecked", 3)[0] == "chw_v2_unchecked"
    assert resolve_warp_impl("tiled_v3", 3)[0] == "chw_v3"
    assert resolve_warp_impl("tiled_v3_unchecked", 3)[0] == "chw_v3_unchecked"
    auto_kernel, _ = resolve_warp_impl("auto", 3)
    on_tpu = jax.default_backend() == "tpu"
    assert auto_kernel == ("chw_v3" if on_tpu else "xla")
    wide_kernel, _ = resolve_warp_impl("auto", 24)
    assert wide_kernel == "xla"  # per-tile pixel span too narrow


def test_dispatch_xla_matches_flow_warp():
    rng = np.random.default_rng(3)
    feat = jnp.asarray(rng.random((1, 32, 40, 3)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((1, 32, 40, 2)), jnp.float32)
    a = flow_warp_dispatch(feat, flow, impl="xla")
    b = warp_xla.flow_warp(feat, flow)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ----------------------------------------------------------------------
# fused dual-warp + blend
# ----------------------------------------------------------------------

def _blend_ref(im0, im1, f0, f1, occ):
    w0 = warp_xla.flow_warp(im0, f0)
    w1 = warp_xla.flow_warp(im1, f1)
    return occ * w0 + (1 - occ) * w1


@pytest.mark.parametrize(
    "name,B,H,W,C,mag",
    [
        ("smooth", 1, 64, 384, 3, 4.0),
        ("edges", 1, 64, 384, 3, 30.0),   # pushes taps off-image
        ("batch", 2, 64, 384, 3, 3.0),
        ("spread", 1, 96, 384, 3, 80.0),  # exceeds slab -> cond fallback
    ],
)
def test_blend_tiled_matches_composed(name, B, H, W, C, mag):
    from atmvfi_tpu.ops.warp_pallas import flow_warp_blend_tiled

    rng = np.random.default_rng(5)
    im0 = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    im1 = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    f0 = _smooth_flow(B, H, W, mag, seed=hash(name) % 100)
    f1 = _smooth_flow(B, H, W, mag, seed=(hash(name) + 1) % 100)
    occ = jnp.asarray(rng.random((B, H, W, 1)), jnp.float32)
    got = flow_warp_blend_tiled(im0, im1, f0, f1, occ, interpret=True)
    want = _blend_ref(im0, im1, f0, f1, occ)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_blend_dispatch_returns_consistent_triple():
    from atmvfi_tpu.ops.warp_pallas import flow_warp_blend

    rng = np.random.default_rng(6)
    im0 = jnp.asarray(rng.random((1, 64, 384, 3)), jnp.float32)
    im1 = jnp.asarray(rng.random((1, 64, 384, 3)), jnp.float32)
    f0 = _smooth_flow(1, 64, 384, 4.0, seed=3)
    f1 = _smooth_flow(1, 64, 384, 4.0, seed=4)
    occ = jnp.asarray(rng.random((1, 64, 384, 1)), jnp.float32)
    I_t, w0, w1 = flow_warp_blend(im0, im1, f0, f1, occ, impl="tiled_blend")
    np.testing.assert_allclose(
        np.asarray(I_t), np.asarray(occ * w0 + (1 - occ) * w1), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(w0), np.asarray(warp_xla.flow_warp(im0, f0)), atol=1e-5
    )


def test_blend_small_shape_reuses_single_warps():
    from atmvfi_tpu.ops.warp_pallas import flow_warp_blend

    rng = np.random.default_rng(7)
    im0 = jnp.asarray(rng.random((1, 16, 24, 3)), jnp.float32)
    im1 = jnp.asarray(rng.random((1, 16, 24, 3)), jnp.float32)
    f0 = jnp.asarray(rng.standard_normal((1, 16, 24, 2)), jnp.float32) * 2
    f1 = jnp.asarray(rng.standard_normal((1, 16, 24, 2)), jnp.float32) * 2
    occ = jnp.asarray(rng.random((1, 16, 24, 1)), jnp.float32)
    I_t, w0, w1 = flow_warp_blend(im0, im1, f0, f1, occ, impl="tiled")
    np.testing.assert_array_equal(
        np.asarray(I_t), np.asarray(occ * w0 + (1 - occ) * w1)
    )


def test_blend_gradients_match_composed():
    from atmvfi_tpu.ops.warp_pallas import flow_warp_blend

    rng = np.random.default_rng(8)
    im0 = jnp.asarray(rng.random((1, 64, 384, 3)), jnp.float32)
    im1 = jnp.asarray(rng.random((1, 64, 384, 3)), jnp.float32)
    f0 = _smooth_flow(1, 64, 384, 3.0, seed=11)
    f1 = _smooth_flow(1, 64, 384, 3.0, seed=12)
    occ = jnp.asarray(rng.random((1, 64, 384, 1)), jnp.float32)

    def loss_fused(a, b, u, v, o):
        return jnp.sum(flow_warp_blend(a, b, u, v, o, impl="tiled_blend")[0] ** 2)

    def loss_ref(a, b, u, v, o):
        return jnp.sum(_blend_ref(a, b, u, v, o) ** 2)

    gs_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(im0, im1, f0, f1, occ)
    gs_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(im0, im1, f0, f1, occ)
    for gf, gr in zip(gs_f, gs_r):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-3)


@pytest.mark.parametrize("inner", ["scan", "span"])
def test_planar_warp_matches_nhwc(inner):
    """Planar-in/planar-out warp == NHWC warp modulo layout."""
    from atmvfi_tpu.ops.warp_pallas import (
        flow_warp_tiled_planar,
        nhwc_to_planar,
        planar_to_nhwc,
    )

    rng = np.random.default_rng(7)
    B, H, W, C = 1, 64, 384, 3
    feat = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    flow = _smooth_flow(B, H, W, 5.0, seed=9)
    p = nhwc_to_planar(feat)
    got = planar_to_nhwc(
        flow_warp_tiled_planar(p, flow, B, interpret=True, inner=inner), B
    )
    want = warp_xla.flow_warp(feat, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_planar_warp_chain_and_grads():
    """warp(warp(x)) chained in planar layout + gradient via the
    custom VJP equals the NHWC composition."""
    from atmvfi_tpu.ops.warp_pallas import (
        nhwc_to_planar,
        planar_to_nhwc,
        planar_warp_op,
    )

    rng = np.random.default_rng(8)
    B, H, W, C = 1, 64, 384, 3
    feat = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    f1 = _smooth_flow(B, H, W, 3.0, seed=1)
    f2 = _smooth_flow(B, H, W, 2.0, seed=2)

    def planar(feat, f1, f2):
        p = nhwc_to_planar(feat)
        p = planar_warp_op(p, f1, B, "chw", True)
        p = planar_warp_op(p, f2, B, "chw_v2", True)
        return planar_to_nhwc(p, B)

    def ref(feat, f1, f2):
        return warp_xla.flow_warp(warp_xla.flow_warp(feat, f1), f2)

    got = planar(feat, f1, f2)
    want = ref(feat, f1, f2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    g1 = jax.grad(lambda *a: jnp.sum(planar(*a) ** 2), argnums=(0, 1, 2))(
        feat, f1, f2
    )
    g2 = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums=(0, 1, 2))(
        feat, f1, f2
    )
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.parametrize("kernel", ["chw", "chw_v2", "chw_unchecked"])
def test_warp_pair_matches_two_singles(kernel):
    """Pair op (one exactness cond for both warps) is bit-identical to
    two independent warps, fast and fallback branches alike."""
    from atmvfi_tpu.ops.warp_pallas import warp_pair_op

    rng = np.random.default_rng(11)
    B, H, W, C = 1, 64, 384, 3
    im0 = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    im1 = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    for mag, tag in ((4.0, "smooth"), (500.0, "pathological")):
        if tag == "pathological" and kernel.endswith("unchecked"):
            continue  # unchecked mode documents inexactness there
        f0 = _smooth_flow(B, H, W, mag, seed=3)
        f1 = _smooth_flow(B, H, W, mag, seed=4)
        w0, w1 = warp_pair_op(im0, im1, f0, f1, kernel, True)
        np.testing.assert_allclose(
            np.asarray(w0), np.asarray(warp_xla.flow_warp(im0, f0)),
            atol=1e-5, err_msg=f"{kernel}/{tag}/w0")
        np.testing.assert_allclose(
            np.asarray(w1), np.asarray(warp_xla.flow_warp(im1, f1)),
            atol=1e-5, err_msg=f"{kernel}/{tag}/w1")


def test_warp_pair_gradients():
    from atmvfi_tpu.ops.warp_pallas import warp_pair_op

    rng = np.random.default_rng(12)
    B, H, W, C = 1, 64, 384, 3
    im0 = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    im1 = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    f0 = _smooth_flow(B, H, W, 3.0, seed=5)
    f1 = _smooth_flow(B, H, W, 2.0, seed=6)

    def pair_loss(*a):
        w0, w1 = warp_pair_op(*a, "chw", True)
        return jnp.sum(w0**2) + jnp.sum((w1 - 0.5) ** 2)

    def ref_loss(i0, i1, u0, u1):
        return (jnp.sum(warp_xla.flow_warp(i0, u0) ** 2)
                + jnp.sum((warp_xla.flow_warp(i1, u1) - 0.5) ** 2))

    g1 = jax.grad(pair_loss, argnums=(0, 1, 2, 3))(im0, im1, f0, f1)
    g2 = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(im0, im1, f0, f1)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_planar_warp_pair_matches_two_singles():
    from atmvfi_tpu.ops.warp_pallas import (
        nhwc_to_planar,
        planar_to_nhwc,
        planar_warp_pair_op,
    )

    rng = np.random.default_rng(13)
    B, H, W, C = 1, 64, 384, 3
    im0 = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    im1 = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    f0 = _smooth_flow(B, H, W, 4.0, seed=7)
    f1 = _smooth_flow(B, H, W, 3.0, seed=8)
    p0, p1 = nhwc_to_planar(im0), nhwc_to_planar(im1)
    w0p, w1p = planar_warp_pair_op(p0, p1, f0, f1, B, "chw", True)
    np.testing.assert_allclose(
        np.asarray(planar_to_nhwc(w0p, B)),
        np.asarray(warp_xla.flow_warp(im0, f0)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(planar_to_nhwc(w1p, B)),
        np.asarray(warp_xla.flow_warp(im1, f1)), atol=1e-5)
