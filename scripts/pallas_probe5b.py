"""Mosaic probe 5b: PROVABLY-ALIGNED plane-DMA source geometries.

probe5 g1/g2 failed with "Failed to prove that a tile index in
dimension 1 is divisible by the tiling (8)": HBM slices along a tiled
sublane dim need BOTH an 8-aligned shape AND a start Mosaic can PROVE
8-divisible (a scalar-prefetch value or clip(8k-1,...) cannot be).

The first cut of this probe also mutated the slab DEST (C=2 slabs,
4D block dests) and died on ITS OWN dest slices — dest here is kept
IDENTICAL to probe5 g1 (which only complained about the source):
[rows, C>=8, W] slab, integer-channel squeeze `slab.at[:, p, :]`.

  g5 f32 / g6 bf16 [NP,BH,W] source: 24/32-row slice, start =
     clip(trb-1, 0, ...) * GRAN with GRAN = 8 (f32) / 16 (bf16, HBM
     tiling is (8,128)(2,1) = 16 rows per dim-1 tile) — multiply-last
     form so divisibility is syntactically provable
  g8 f32 / bf16 plan B: planes reshaped [NP, BH/G, G, W]; rows ride
     an UNTILED dim -> dynamic slice with no alignment proof needed
     (probe5 g4 precedent); dest slab [blocks*G, C, W] via one DMA
     per block into slab.at[pl.ds(b*G, G), p, :].

Run on the axon TPU: python -u scripts/pallas_probe5b.py
CPU smoke: ATMVFI_INTERPRET=1 JAX_PLATFORMS=cpu python -u scripts/pallas_probe5b.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERP = bool(os.environ.get("ATMVFI_INTERPRET"))


def run(name, fn):
    try:
        msg = fn()
        print(f"  {name}: OK {msg}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  {name}: FAIL {type(e).__name__}: {str(e)[:160]}",
              flush=True)


def _aligned_window(dtype):
    """[NP=2, BH=64, W=256] planes; per grid step trb, slice a
    GRAN-aligned (3*GRAN)-row window whose start is clip-then-multiply
    (provable); echo the window."""
    BH, W = 64, 256
    C = 16 if dtype == jnp.bfloat16 else 8
    GRAN = 16 if dtype == jnp.bfloat16 else 8
    rows = 3 * GRAN
    n_blk = BH // GRAN

    def kernel(planes_ref, o_ref, slab, sem):
        trb = pl.program_id(0)
        start = jnp.clip(trb - 1, 0, n_blk - 3) * GRAN
        for p in range(2):
            cp = pltpu.make_async_copy(
                planes_ref.at[p, pl.ds(start, rows), :],
                slab.at[:, p, :],
                sem.at[p],
            )
            cp.start()
            cp.wait()
        for p in range(2):
            o_ref[0, p] = slab[:, p, :]

    planes = (
        jnp.arange(2 * BH * W, dtype=jnp.float32)
        .reshape(2, BH, W)
        .astype(dtype)
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(3,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, 2, rows, W), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((rows, C, W), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((3, 2, rows, W), dtype),
        interpret=INTERP,
    )(planes)
    pf = np.asarray(planes.astype(jnp.float32))
    of = np.asarray(out.astype(jnp.float32))
    for t in range(3):
        start = int(np.clip(t - 1, 0, n_blk - 3)) * GRAN
        np.testing.assert_allclose(of[t], pf[:, start : start + rows])
    return f"exact (rows={rows}, gran={GRAN})"


def g8_untiled_blocks(dtype):
    """Plan B: planes [NP, BH/G, G, W] (rows split into an untiled
    block dim); DMA 3 blocks at a DYNAMIC UNALIGNED block index into a
    [3G, C, W] slab, one copy per block (dest starts static)."""
    BH, W = 64, 256
    C = 16 if dtype == jnp.bfloat16 else 8
    G = 16 if dtype == jnp.bfloat16 else 8
    NB = BH // G

    def kernel(s_ref, planes_ref, o_ref, slab, sem):
        blk = s_ref[0]
        for p in range(2):
            for b in range(3):
                cp = pltpu.make_async_copy(
                    planes_ref.at[p, blk + b, :, :],
                    slab.at[pl.ds(b * G, G), p, :],
                    sem.at[p, b],
                )
                cp.start()
            for b in range(3):
                pltpu.make_async_copy(
                    planes_ref.at[p, blk + b, :, :],
                    slab.at[pl.ds(b * G, G), p, :],
                    sem.at[p, b],
                ).wait()
        for p in range(2):
            o_ref[p] = slab[:, p, :]

    planes = (
        jnp.arange(2 * BH * W, dtype=jnp.float32)
        .reshape(2, NB, G, W)
        .astype(dtype)
    )
    blk = 1
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((3 * G, C, W), dtype),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((2, 3 * G, W), dtype),
        interpret=INTERP,
    )(jnp.array([blk], jnp.int32), planes)
    pf = np.asarray(planes.astype(jnp.float32)).reshape(2, BH, W)
    of = np.asarray(out.astype(jnp.float32))
    want = pf[:, blk * G : blk * G + 3 * G]
    np.testing.assert_allclose(of, want)
    return f"exact (G={G})"


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    run("g5 f32  24-row start=clip*8   ",
        lambda: _aligned_window(jnp.float32))
    run("g6 bf16 48-row start=clip*16  ",
        lambda: _aligned_window(jnp.bfloat16))
    run("g8 f32  untiled-blk dyn window",
        lambda: g8_untiled_blocks(jnp.float32))
    run("g8 bf16 untiled-blk dyn window",
        lambda: g8_untiled_blocks(jnp.bfloat16))


if __name__ == "__main__":
    main()
