"""Mosaic probe 5d: the remaining legality cells for the planes-kernel
redesign (Option A: per-lane-tile slab units).

probe5c frontier: HBM tiled-dim source slices need provable-8-aligned
starts + 8-multiple shapes; VMEM channel-squeeze DMA dests are legal
ONLY when the slab memref has a single lane tile (last dim == 128).

  s4 bf16 3D src 24-row clip*8 window -> full 2D slab
     (is bf16's (8,128)(2,1) HBM tiling 8- or 16-granular for slices?)
  d6 aligned sublane-RANGE dest: slab (24,16,128) f32,
     dest .at[:, ds(0,8), :]  (the feat part of a planes DMA)
  d7 5D slab (2,2,24,8,128) f32, dest .at[1,1,:,ch,:]
     (slot+lanetile squeeze + channel squeeze — the Option-A form)
  d8 bf16 channel squeeze at one lane tile: slab (24,16,128)

Run on the axon TPU: python -u scripts/pallas_probe5d.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        msg = fn()
        print(f"  {name}: OK {msg}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: FAIL {type(e).__name__}: {str(e)[:120]}",
              flush=True)


def s4_bf16_src():
    BH, W, rows = 64, 256, 24

    def kernel(x_ref, o_ref, slab, sem):
        start = jnp.clip(pl.program_id(0) - 1, 0, BH // 8 - 3) * 8
        cp = pltpu.make_async_copy(
            x_ref.at[0, pl.ds(start, rows), :], slab.at[:, :], sem
        )
        cp.start()
        cp.wait()
        o_ref[0] = slab[:, :]

    x = (jnp.arange(2 * BH * W, dtype=jnp.float32)
         .reshape(2, BH, W).astype(jnp.bfloat16))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(3,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, rows, W), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((rows, W), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA(())],
        ),
        out_shape=jax.ShapeDtypeStruct((3, rows, W), jnp.bfloat16),
    )(x)
    xf = np.asarray(x.astype(jnp.float32))[0]
    of = np.asarray(out.astype(jnp.float32))
    for t in range(3):
        start = int(np.clip(t - 1, 0, 5)) * 8
        np.testing.assert_allclose(of[t], xf[start : start + rows])
    return "exact"


def d6_aligned_sublane_range():
    rows, W = 24, 128

    def kernel(x_ref, o_ref, slab, sem):
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(0, rows), :, :], slab.at[:, pl.ds(0, 8), :], sem
        )
        cp.start()
        cp.wait()
        o_ref[...] = slab[:, pl.ds(0, 8), :]

    x = jnp.arange(rows * 8 * W, dtype=jnp.float32).reshape(rows, 8, W)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((rows, 8, W), lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 8, W), jnp.float32),
        grid=(),
        scratch_shapes=[pltpu.VMEM((rows, 16, W), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))
    return "exact"


def d7_5d_option_a():
    rows, C, W = 24, 8, 128

    def kernel(x_ref, o_ref, slab, sem):
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(0, rows), :], slab.at[1, 1, :, 3, :], sem
        )
        cp.start()
        cp.wait()
        o_ref[...] = slab[1, 1, :, 3, :]

    x = jnp.arange(rows * W, dtype=jnp.float32).reshape(rows, W)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((rows, W), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, W), jnp.float32),
        grid=(),
        scratch_shapes=[pltpu.VMEM((2, 2, rows, C, W), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))
    return "exact"


def d8_bf16_one_tile():
    rows, C, W = 24, 16, 128

    def kernel(x_ref, o_ref, slab, sem):
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(0, rows), :], slab.at[:, 3, :], sem
        )
        cp.start()
        cp.wait()
        o_ref[...] = slab[:, 3, :]

    x = (jnp.arange(rows * W, dtype=jnp.float32)
         .reshape(rows, W).astype(jnp.bfloat16))
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((rows, W), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, W), jnp.bfloat16),
        grid=(),
        scratch_shapes=[pltpu.VMEM((rows, C, W), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA(())],
    )(x)
    np.testing.assert_allclose(
        np.asarray(out.astype(jnp.float32)),
        np.asarray(x.astype(jnp.float32)))
    return "exact"


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    run("s4 bf16 src 24-row clip*8    ", s4_bf16_src)
    run("d6 aligned sublane-range dest", d6_aligned_sublane_range)
    run("d7 5D slot+lt+ch squeeze dest", d7_5d_option_a)
    run("d8 bf16 ch squeeze one tile  ", d8_bf16_one_tile)


if __name__ == "__main__":
    main()
