"""Mosaic probe 5 (consolidated): the plane-DMA legality frontier that
forced the planar tail's GROUPED planes layout (`to_grouped_planes`,
ops/conv_pallas.py::_kernel_planes).

Measured constraint surface (v5e, 2026-08-19 — logs /tmp/p5*.log,
narrative in PERF_NOTES.md "Planar tail: Mosaic reject -> GROUPED"):

HBM SOURCE slices along a TILED (sublane) dim:
  - shape must be an 8-multiple (the original 10-row window is the
    reject that started this: "Slice shape along dimension 1 must be
    aligned to tiling (8), but is 10")
  - dynamic starts must be PROVABLY 8-divisible: multiply-last
    `clip(...)*8` passes (s1/s3/s4 incl. bf16), a scalar-prefetch
    value does not even when its runtime value is aligned (s2 FAIL)
  - rows moved to an UNTILED dim (grouped [NG, BH, 8, W]) accept any
    dynamic start and any count (s5, s7/s8)

VMEM DEST slices along the slab's channel (sublane) dim:
  - f32 single-channel squeeze `slab[:, c, :]` legal ONLY at one lane
    tile (W==128: d1/d3 OK; W==256: d2/d4/d5 FAIL — chunking the DMA
    into 128-lane pieces does not help, the slab layout is the issue)
  - bf16 single-channel squeeze never legal (d8 FAIL), channel PAIRS
    ds(2,2) also illegal (d9c FAIL)
  - aligned 8-channel RANGES ds(8k, 8) legal for BOTH dtypes at any
    width (d6, d9a/d9b) — this is what the grouped layout buys

s7/s8 re-run the production kernel's REAL slab geometry
((2,10,16,512) slab, width-384 offset lane slices, unaligned dynamic
row start) end-to-end: bf16 + f32 exact.

Run on the axon TPU: python -u scripts/pallas_probe5.py
CPU smoke (legality cells meaningless, values only):
  ATMVFI_INTERPRET=1 JAX_PLATFORMS=cpu python -u scripts/pallas_probe5.py
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
        print(f"  {name}: FAIL {type(e).__name__}: {str(e)[:120]}",
              flush=True)


def _src_probe(mode):
    """HBM source slices along the tiled row dim of a flat plane
    stack. s1: provable dynamic start (clip*8). s2: scalar-prefetch
    start, value aligned but provenance unprovable — expected FAIL.
    s3: 3D [NP,BH,W] integer plane squeeze + provable row window."""
    BH, W = 64, 256
    rows = 24

    def kernel(*refs):
        if mode == "s2":
            s_ref, x_ref, o_ref, slab, sem = refs
            start = s_ref[0]
        else:
            x_ref, o_ref, slab, sem = refs
            start = jnp.clip(pl.program_id(0) - 1, 0, BH // 8 - 3) * 8
        src = (x_ref.at[0, pl.ds(start, rows), :] if mode == "s3"
               else x_ref.at[pl.ds(start, rows), :])
        cp = pltpu.make_async_copy(src, slab.at[:, :], sem)
        cp.start()
        cp.wait()
        o_ref[0] = slab[:, :]

    shape = (2, BH, W) if mode == "s3" else (BH, W)
    x = jnp.arange(np.prod(shape), dtype=jnp.float32).reshape(shape)
    nsp = 1 if mode == "s2" else 0
    args = ([jnp.array([8], jnp.int32)] if mode == "s2" else []) + [x]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=nsp,
            grid=(3,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, rows, W), lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((rows, W), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((3, rows, W), jnp.float32),
        interpret=INTERP,
    )(*args)
    xf = np.asarray(x).reshape(-1, BH, W)[0]
    of = np.asarray(out)
    for t in range(3):
        start = 8 if mode == "s2" else int(np.clip(t - 1, 0, 5)) * 8
        np.testing.assert_allclose(of[t], xf[start : start + rows])
    return "exact"


def _dst_squeeze(rows, W):
    """f32 single-channel slab squeeze `slab[:, c, :]` — legal only
    when the slab has one lane tile (W == 128)."""
    def kernel(x_ref, o_ref, slab, sem):
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(0, rows), :], slab.at[:, 1, :], sem
        )
        cp.start()
        cp.wait()
        o_ref[...] = slab[:, 1, :]

    x = jnp.arange(rows * W, dtype=jnp.float32).reshape(rows, W)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((rows, W), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, W), jnp.float32),
        grid=(),
        scratch_shapes=[pltpu.VMEM((rows, 8, W), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=INTERP,
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))
    return "exact"


def _d9(lo, n):
    """bf16 channel-dim dest slices: 8-aligned 8-RANGES legal
    (d9a/d9b), pairs illegal (d9c)."""
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
        interpret=INTERP,
    )(x)
    np.testing.assert_allclose(np.asarray(out.astype(jnp.float32)),
                               np.asarray(x.astype(jnp.float32)))
    return "exact"


def _grouped_real_geometry(dtype):
    """The production _kernel_planes DMA shapes: grouped plane source
    [NG, BH, 8, W] (rows untiled -> unaligned dynamic start legal),
    feat + 8-channel-range dests on a (10, 16, 512) slab slot."""
    BH, W, EXT = 64, 512, 512
    Cf, G = 8, 8
    Cin = Cf + G

    def kernel(s_ref, x_ref, g_ref, o_ref, slab, sem):
        rs = s_ref[0]  # unaligned dynamic row start (untiled dims)
        cps = [
            pltpu.make_async_copy(
                x_ref.at[pl.ds(rs, 10), :, pl.ds(128, 384)],
                slab.at[0, :, pl.ds(0, Cf), pl.ds(128, 384)],
                sem.at[0],
            ),
            pltpu.make_async_copy(
                g_ref.at[0, pl.ds(rs, 10), :, pl.ds(128, 384)],
                slab.at[0, :, pl.ds(Cf, G), pl.ds(128, 384)],
                sem.at[1],
            ),
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        for r in range(10):
            o_ref[r] = slab[0, r]

    x = (jnp.arange(BH * Cf * W, dtype=jnp.float32)
         .reshape(BH, Cf, W).astype(dtype))
    g = (jnp.arange(BH * G * W, dtype=jnp.float32)
         .reshape(1, BH, G, W).astype(dtype) * -1.0)
    rs = 7
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 10, Cin, EXT), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((10, Cin, EXT), dtype),
        interpret=INTERP,
    )(jnp.array([rs], jnp.int32), x, g)
    of = np.asarray(out.astype(jnp.float32))
    xf = np.asarray(x.astype(jnp.float32))
    gf = np.asarray(g.astype(jnp.float32))
    np.testing.assert_allclose(
        of[:, :Cf, 128:512], xf[rs : rs + 10, :, 128:512])
    np.testing.assert_allclose(
        of[:, Cf:, 128:512],
        gf[0, rs : rs + 10].reshape(10, G, W)[:, :, 128:512])
    return "exact"


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    run("s1 2D src provable dyn start ", lambda: _src_probe("s1"))
    run("s2 2D src scalar-arg start   ", lambda: _src_probe("s2"))
    run("s3 3D src squeeze + provable ", lambda: _src_probe("s3"))
    run("d1 slab( 8,8,128) ch-squeeze ", lambda: _dst_squeeze(8, 128))
    run("d4 slab(24,8,256) ch-squeeze ", lambda: _dst_squeeze(24, 256))
    run("d9a bf16 ch-range ds(0,8)    ", lambda: _d9(0, 8))
    run("d9c bf16 ch-pair  ds(2,2)    ", lambda: _d9(2, 2))
    run("s7 bf16 grouped real geometry",
        lambda: _grouped_real_geometry(jnp.bfloat16))
    run("s8 f32  grouped real geometry",
        lambda: _grouped_real_geometry(jnp.float32))


if __name__ == "__main__":
    main()
