"""End-to-end pipeline smoke on the bundled example frames (lite, CPU)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atmvfi_tpu.infer.pipeline import InterpolationPipeline
from atmvfi_tpu.models import Network, get_config
from atmvfi_tpu.utils.images import read_image

ASSET0 = "/root/reference/asset/example_frame0.png"
ASSET1 = "/root/reference/asset/example_frame1.png"


@pytest.fixture(scope="module")
def lite_pipeline():
    cfg = get_config("lite")
    net = Network(cfg)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), dummy, dummy)
    return InterpolationPipeline(
        variables, variant="lite", dtype=jnp.float32, global_motion=False
    )


@pytest.mark.skipif(not os.path.exists(ASSET0), reason="asset frames absent")
def test_interpolate_example_frames(lite_pipeline):
    img0 = read_image(ASSET0)
    img1 = read_image(ASSET1)
    # downscale for CPU test speed
    img0 = img0[::4, ::4]
    img1 = img1[::4, ::4]
    mid = lite_pipeline.interpolate(img0, img1)
    assert mid.shape == img0.shape
    assert mid.dtype == np.uint8


def test_interpolate_stream_2x(lite_pipeline):
    rng = np.random.default_rng(0)
    frames = [(rng.random((40, 56, 3)) * 255).astype(np.uint8) for _ in range(3)]
    out = list(lite_pipeline.interpolate_stream(iter(frames), factor=2))
    # N inputs -> 2*(N-1)+1 outputs; even outputs are the source frames
    assert len(out) == 5
    for i, src in zip((0, 2, 4), frames):
        np.testing.assert_array_equal(out[i], src)
    assert all(f.shape == frames[0].shape for f in out)


@pytest.mark.parametrize(
    "factor,n_frames,batch",
    [
        (2, 6, 2),   # two full flushes + padded tail (batch graph reused)
        (4, 4, 3),   # exact flush, no tail
        (2, 3, 8),   # stream shorter than one batch: unpadded tail path
    ],
)
def test_interpolate_stream_batched_matches_unbatched(
    lite_pipeline, factor, n_frames, batch
):
    rng = np.random.default_rng(2)
    frames = [
        (rng.random((40, 56, 3)) * 255).astype(np.uint8)
        for _ in range(n_frames)
    ]
    want = list(lite_pipeline.interpolate_stream(iter(frames), factor=factor))
    got = list(
        lite_pipeline.interpolate_stream_batched(
            iter(frames), factor=factor, batch=batch
        )
    )
    assert len(got) == len(want) == factor * (n_frames - 1) + 1
    for g, w in zip(got, want):
        if jax.default_backend() == "cpu":
            # exact on CPU; the batch-1 and batch-N graphs may differ by
            # reduction-order ulps on TPU/GPU -> off-by-one after the
            # uint8 rounding is acceptable there
            np.testing.assert_array_equal(g, w)
        else:
            assert np.max(np.abs(g.astype(np.int16) - w.astype(np.int16))) <= 1


def test_interpolate_stream_4x(lite_pipeline):
    rng = np.random.default_rng(1)
    frames = [(rng.random((40, 56, 3)) * 255).astype(np.uint8) for _ in range(2)]
    out = list(lite_pipeline.interpolate_stream(iter(frames), factor=4))
    assert len(out) == 5
    np.testing.assert_array_equal(out[0], frames[0])
    np.testing.assert_array_equal(out[4], frames[1])


def test_mesh_pipeline_matches_single_device():
    """InterpolationPipeline(mesh=...) — the multi-chip 4K serving path:
    weights replicate, activations H-shard over 'spatial', impls force
    to XLA (GSPMD cannot partition the Pallas custom calls), and the
    result matches the unsharded pipeline."""
    from atmvfi_tpu.parallel import make_mesh

    assert len(jax.devices()) >= 8
    cfg = get_config("lite")
    net = Network(cfg)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(3), dummy, dummy)
    kw = dict(variant="lite", dtype=jnp.float32, global_motion=True)
    ref_pipe = InterpolationPipeline(variables, **kw)
    # gspmd mode: the automatic partitioner cannot split custom calls,
    # so it must force the XLA op implementations
    gspmd_pipe = InterpolationPipeline(
        variables, mesh=make_mesh((1, 8)), spmd="gspmd", **kw
    )
    assert gspmd_pipe.cfg.warp_impl == "xla"
    assert gspmd_pipe.cfg.conv_impl == "xla"
    assert gspmd_pipe.cfg.attention_impl == "xla"
    # spatial (default) mode: the shard_map schedule keeps the config
    spatial_pipe = InterpolationPipeline(
        variables, mesh=make_mesh((1, 8)), **kw
    )
    assert spatial_pipe._spatial_fwd is not None
    assert spatial_pipe.cfg.warp_impl == "auto"

    rng = np.random.default_rng(7)
    img0 = (rng.random((120, 120, 3)) * 255).astype(np.uint8)
    img1 = (rng.random((120, 120, 3)) * 255).astype(np.uint8)
    want = ref_pipe.interpolate(img0, img1)
    for pipe in (gspmd_pipe, spatial_pipe):
        got = pipe.interpolate(img0, img1)
        # sharding changes XLA reduction order; after uint8 rounding an
        # off-by-one is the worst admissible difference
        assert np.max(
            np.abs(got.astype(np.int16) - want.astype(np.int16))
        ) <= 1


def test_window_reconfig_reuses_params(lite_pipeline):
    rng = np.random.default_rng(2)
    img0 = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
    img1 = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
    base = lite_pipeline.interpolate(img0, img1)
    lite_pipeline.set_window_sizes(local=6, global_=8)
    changed = lite_pipeline.interpolate(img0, img1)
    assert base.shape == changed.shape
    lite_pipeline.set_window_sizes(local=8, global_=12)
    back = lite_pipeline.interpolate(img0, img1)
    np.testing.assert_array_equal(base, back)
