"""shard_map serving schedules (parallel/spatial.py): equality vs the
single-device forward on the virtual 8-CPU mesh.

These guard the DECOMPOSITION — slab geometry, boundary shifting,
source-offset warps, gathers, crop bookkeeping — which is
implementation-independent; the Mosaic compile path of the kernels
inside shard_map is validated on device (scripts/tpu_spatial_check.py).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atmvfi_tpu.models import Network, get_config
from atmvfi_tpu.parallel import make_mesh
from atmvfi_tpu.parallel.spatial import (
    make_dp_forward,
    make_spatial_forward,
    spatial_ici_bytes,
)


def _build(H, W, cfg):
    net = Network(cfg)
    rng = np.random.default_rng(0)
    im0 = jnp.asarray(rng.random((1, H, W, 3), np.float32))
    im1 = jnp.asarray(rng.random((1, H, W, 3), np.float32))
    variables = net.init(jax.random.PRNGKey(0), im0, im1)
    return net, variables, im0, im1


@pytest.mark.parametrize("deep", [True, False])
@pytest.mark.parametrize("global_motion", [True, False])
def test_spatial_forward_matches_single_device(global_motion, deep):
    """2-shard spatial serving == single-device forward.

    H=320, margin=64: shard 1's slab is boundary-shifted (crop 128),
    so the interior-erosion + shifted-edge geometry are both active,
    in both the deep (sharded front + replicated attention middle)
    and shallow (replicated head) cuts. XLA op impls (CPU default) —
    the decomposition under test is impl-independent."""
    cfg = get_config("lite")
    H, W = 320, 384
    net, variables, im0, im1 = _build(H, W, cfg)
    ref = net.apply(variables, im0, im1, global_motion=global_motion)[
        "I_t"
    ]

    mesh = make_mesh((1, 2), jax.devices()[:2])
    fwd = make_spatial_forward(net, mesh, margin=64,
                               global_motion=global_motion, deep=deep)
    out = jax.jit(fwd)(variables, im0, im1)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_spatial_forward_deep_unclamped():
    """Deep cut at H=640, n=2, margin=96: slabs do NOT clamp to the
    full frame (shard 0 slab [0,512), shard 1 [128,640)), so the
    front's token-crop/all-gather and the erosion margins of all three
    sharded decoder stages are genuinely exercised."""
    cfg = get_config("lite")
    H, W = 640, 384
    net, variables, im0, im1 = _build(H, W, cfg)
    ref = net.apply(variables, im0, im1, global_motion=True)["I_t"]

    mesh = make_mesh((1, 2), jax.devices()[:2])
    fwd = make_spatial_forward(net, mesh, margin=96, global_motion=True)
    out = jax.jit(fwd)(variables, im0, im1)
    # the sharded front computes the encoder on slab-shaped subgraphs,
    # which reorders f32 conv/LN sums vs the monolithic graph; 0.025%
    # of pixels land a few 1e-5 off (max 4.6e-5 measured, spread over
    # the frame — NOT slab-boundary concentrated, i.e. not erosion)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_spatial_forward_sharded_middle_halo_active():
    """4-shard deep cut at H=1024 (H/8 = 128 token rows): the
    attention-middle slab (h8_loc 32 + halo -> 104 rows) genuinely
    crops < full height, so the shifted-window wrap corruption at slab
    edges and the halo that absorbs it are both exercised."""
    cfg = get_config("lite")
    H, W = 1024, 256
    net, variables, im0, im1 = _build(H, W, cfg)
    ref = net.apply(variables, im0, im1, global_motion=True)["I_t"]

    mesh = make_mesh((1, 4), jax.devices()[:4])
    fwd = make_spatial_forward(net, mesh, margin=96, global_motion=True)
    out = jax.jit(fwd)(variables, im0, im1)
    # same f32 sum-order band as the unclamped-front test
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_spatial_forward_ensemble():
    """Ensemble global motion on the mesh path (round-5 VERDICT item
    6): multiscale estimate replicated in the shallow head, equality
    vs the single-device ensemble forward."""
    cfg = get_config("lite")
    H, W = 320, 384
    net, variables, im0, im1 = _build(H, W, cfg)
    ref = net.apply(variables, im0, im1, global_motion=True,
                    ensemble_global_motion=True)["I_t"]

    mesh = make_mesh((1, 2), jax.devices()[:2])
    fwd = make_spatial_forward(net, mesh, margin=64, global_motion=True,
                               ensemble_global_motion=True)
    out = jax.jit(fwd)(variables, im0, im1)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_spatial_forward_kernel_route_single_shard():
    """Degenerate 1-shard spatial path with the Pallas routes forced
    (interpret mode on CPU): exercises serving_head/serving_tail
    through the planar/HCW kernel code, equality vs __call__."""
    cfg = dataclasses.replace(
        get_config("lite"), conv_impl="pallas", warp_impl="tiled_v3",
        tail_planar="on",
    )
    H, W = 128, 384
    net, variables, im0, im1 = _build(H, W, cfg)
    ref = net.apply(variables, im0, im1, global_motion=True)["I_t"]

    mesh = make_mesh((1, 1), jax.devices()[:1])
    fwd = make_spatial_forward(net, mesh, margin=16)
    out = jax.jit(fwd)(variables, im0, im1)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_spatial_forward_4shard_compose():
    """4-shard + fast profile (compose_full_res_warps): the unwarped-
    planes slab branch of serving_tail."""
    cfg = dataclasses.replace(get_config("lite"),
                              compose_full_res_warps=True)
    H, W = 640, 384
    net, variables, im0, im1 = _build(H, W, cfg)
    ref = net.apply(variables, im0, im1, global_motion=True)["I_t"]

    mesh = make_mesh((1, 4), jax.devices()[:4])
    fwd = make_spatial_forward(net, mesh, margin=64)
    out = jax.jit(fwd)(variables, im0, im1)
    # compose mode folds the (large) global flow into the decoder
    # flows in f32; slab-shaped subgraphs reorder those f32 sums, so
    # ~0.1% of pixels differ at the few-1e-5 level (vs 2e-5 elsewhere)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_dp_forward_matches_single_device():
    """4-way batch sharding: per-shard full model, zero collectives."""
    cfg = get_config("lite")
    H, W = 64, 128
    net = Network(cfg)
    rng = np.random.default_rng(1)
    im0 = jnp.asarray(rng.random((4, H, W, 3), np.float32))
    im1 = jnp.asarray(rng.random((4, H, W, 3), np.float32))
    variables = net.init(jax.random.PRNGKey(0), im0[:1], im1[:1])
    ref = jnp.clip(
        net.apply(variables, im0, im1, global_motion=True)["I_t"], 0, 1
    )

    mesh = make_mesh((4, 1), jax.devices()[:4])
    fwd = make_dp_forward(net, mesh)
    out = jax.jit(fwd)(variables, im0, im1)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_spatial_ici_bytes():
    # 4 plane gathers of (n-1)/n each
    assert spatial_ici_bytes(2176, 3840, 4) == int(
        4 * 3 * 2176 * 3840 * 4 * 3 / 4
    )
    assert spatial_ici_bytes(2176, 3840, 1) == 0
