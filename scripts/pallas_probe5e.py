"""Mosaic probe 5e: final legality cells for the planes-kernel
redesign — the bf16 grouped path end-to-end and the f32 per-plane
path at multiple lane tiles.

From 5c/5d: bf16 dim-1 (sublane) DMA slices need 8-multiple shapes
(channel squeeze and pairs are out); f32 allows per-channel squeezes
but only on single-lane-tile (last dim 128) slabs.

  d9a bf16 slab (24,16,128) dest .at[:, ds(0,8), :]   (8-range)
  d9b bf16 slab (24,16,128) dest .at[:, ds(8,8), :]   (offset 8-range)
  d9c bf16 slab (24,16,128) dest .at[:, ds(2,2), :]   (pair — expect FAIL)
  s5  bf16 grouped round trip: src [2, 64, 8, 256] (rows UNTILED),
      unaligned dynamic row start, per-lane-tile dests into a 5D slab
      (2 slots, 2 lt, 24, 16, 128) at channel range ds(8,8)
  s6  f32 per-plane round trip: src [2, 64, 256], provable 24-row
      start, dests .at[slot, lt, :, ch, :] per plane per lane tile

Run on the axon TPU: python -u scripts/pallas_probe5e.py
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


def _d9(lo, n):
    rows, C, W = 24, 16, 128

    def kernel(x_ref, o_ref, slab, sem):
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(0, rows), :, :], slab.at[:, pl.ds(lo, n), :], sem
        )
        cp.start()
        cp.wait()
        o_ref[...] = slab[:, pl.ds(lo, n), :]

    x = (jnp.arange(rows * n * W, dtype=jnp.float32)
         .reshape(rows, n, W).astype(jnp.bfloat16))
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((rows, n, W), lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n, W), jnp.bfloat16),
        grid=(),
        scratch_shapes=[pltpu.VMEM((rows, C, W), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA(())],
    )(x)
    np.testing.assert_allclose(np.asarray(out.astype(jnp.float32)),
                               np.asarray(x.astype(jnp.float32)))
    return "exact"


def s5_bf16_grouped():
    BH, W, rows = 64, 256, 24
    NG, G = 2, 8

    def kernel(s_ref, g_ref, o_ref, slab, sem):
        start = s_ref[0]  # untiled dim: unaligned dynamic start legal
        for lt in range(2):
            cp = pltpu.make_async_copy(
                g_ref.at[1, pl.ds(start, rows), :,
                         pl.ds(lt * 128, 128)],
                slab.at[0, lt, :, pl.ds(G, G), :],
                sem.at[lt],
            )
            cp.start()
        for lt in range(2):
            pltpu.make_async_copy(
                g_ref.at[1, pl.ds(start, rows), :,
                         pl.ds(lt * 128, 128)],
                slab.at[0, lt, :, pl.ds(G, G), :],
                sem.at[lt],
            ).wait()
        row = jnp.concatenate(
            [slab[0, lt, :, pl.ds(G, G), :] for lt in range(2)], axis=-1
        )  # [rows, G, W]
        o_ref[...] = row

    g = (jnp.arange(NG * BH * G * W, dtype=jnp.float32)
         .reshape(NG, BH, G, W).astype(jnp.bfloat16))
    start = 7
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 2, rows, 16, 128), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((rows, G, W), jnp.bfloat16),
    )(jnp.array([start], jnp.int32), g)
    gf = np.asarray(g.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out.astype(jnp.float32)),
                               gf[1, start : start + rows])
    return "exact (unaligned untiled start)"


def s6_f32_per_plane():
    BH, W, rows = 64, 256, 24
    NP = 2

    def kernel(p_ref, o_ref, slab, sem):
        start = jnp.clip(pl.program_id(0) - 1, 0, BH // 8 - 3) * 8
        for p in range(NP):
            for lt in range(2):
                cp = pltpu.make_async_copy(
                    p_ref.at[p, pl.ds(start, rows), pl.ds(lt * 128, 128)],
                    slab.at[0, lt, :, 2 + p, :],
                    sem.at[p, lt],
                )
                cp.start()
        for p in range(NP):
            for lt in range(2):
                pltpu.make_async_copy(
                    p_ref.at[p, pl.ds(start, rows), pl.ds(lt * 128, 128)],
                    slab.at[0, lt, :, 2 + p, :],
                    sem.at[p, lt],
                ).wait()
        for p in range(NP):
            o_ref[0, p] = jnp.concatenate(
                [slab[0, lt, :, 2 + p, :] for lt in range(2)], axis=-1
            )

    planes = (jnp.arange(NP * BH * W, dtype=jnp.float32)
              .reshape(NP, BH, W))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(3,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, NP, rows, W),
                                   lambda t: (t, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 2, rows, 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((NP, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((3, NP, rows, W), jnp.float32),
    )(planes)
    pf = np.asarray(planes)
    of = np.asarray(out)
    for t in range(3):
        start = int(np.clip(t - 1, 0, 5)) * 8
        np.testing.assert_allclose(of[t], pf[:, start : start + rows])
    return "exact (provable tiled start)"


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    run("d9a bf16 ch-range ds(0,8)    ", lambda: _d9(0, 8))
    run("d9b bf16 ch-range ds(8,8)    ", lambda: _d9(8, 8))
    run("d9c bf16 ch-pair  ds(2,2)    ", lambda: _d9(2, 2))
    run("s5  bf16 grouped round trip  ", s5_bf16_grouped)
    run("s6  f32 per-plane round trip ", s6_f32_per_plane)


if __name__ == "__main__":
    main()
