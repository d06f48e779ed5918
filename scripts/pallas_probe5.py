"""Mosaic capability probe 5: HBM plane-DMA geometries for the planar
tail's planes kernel (ops/conv_pallas.py::_kernel_planes).

The 2026-08-19 device run of tpu_planar_ab failed in Mosaic:
  "Slice shape along dimension 1 must be aligned to tiling (8), but is 10"
on `planes_ref.at[p, pl.ds(row_start, 10), pl.ds(col, w)]` — a planes
stack [NP, BH, W] puts image ROWS in the sublane dim, so HBM slices of
it must have 8-aligned SHAPE there (pallas_probe4 p7 only ever probed
static start + 8-row shape, f32).

This probe answers, for f32 AND bf16, on the [NP, BH, W] layout:
  g1: dynamic UNALIGNED row start + 16-row slice  (minimal kernel fix)
  g2: dynamic 8-ALIGNED row start + 24-row slice  (fallback geometry)
  g3: g1's dest form: single-sublane-channel slab write, bf16
  g4: feat-style dest with a dynamic untiled-dim row offset
      (slab.at[slot, pl.ds(off, 10), ...]) — needed if g2 is required
      and we want to keep the feat DMA at 10 rows.

Run on the axon TPU: python -u scripts/pallas_probe5.py
CPU smoke: ATMVFI_INTERPRET=1 python -u scripts/pallas_probe5.py
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
        print(f"  {name}: FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)


def _plane_window(dtype, rows, align):
    """DMA [NP=2, BH=64, W=256] plane rows [start, start+rows) into a
    [rows, C=8or16, W] VMEM slab's channel slices, echo them out."""
    BH, W = 64, 256
    C = 16 if dtype == jnp.bfloat16 else 8

    def kernel(s_ref, planes_ref, o_ref, slab, sem):
        start = s_ref[0]
        for p in range(2):
            cp = pltpu.make_async_copy(
                planes_ref.at[p, pl.ds(start, rows), :],
                slab.at[:, p, :],
                sem.at[p],
            )
            cp.start()
            cp.wait()
        for p in range(2):
            o_ref[p] = slab[:, p, :]

    planes = (
        jnp.arange(2 * BH * W, dtype=jnp.float32)
        .reshape(2, BH, W)
        .astype(dtype)
    )
    start = 8 if align else 7
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((rows, C, W), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((2, rows, W), dtype),
        interpret=INTERP,
    )(jnp.array([start], jnp.int32), planes)
    want = np.asarray(planes.astype(jnp.float32))[:, start : start + rows]
    np.testing.assert_allclose(
        np.asarray(out.astype(jnp.float32)), want
    )
    return f"exact (start={start}, rows={rows})"


def g4_dynamic_row_offset_dest(dtype):
    """Feat-style DMA whose DEST has a dynamic offset in the slab's
    untiled row dim: x[BH, C, W] rows [fstart, fstart+10) ->
    slab[pl.ds(foff, 10), :, :]."""
    BH, W = 64, 256
    C = 16 if dtype == jnp.bfloat16 else 8
    SR = 24

    def kernel(s_ref, x_ref, o_ref, slab, sem):
        fstart = s_ref[0]
        foff = s_ref[1]
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(fstart, 10), :, :],
            slab.at[pl.ds(foff, 10), :, :],
            sem,
        )
        cp.start()
        cp.wait()
        for r in range(10):
            o_ref[r] = slab[foff + r]

    x = (
        jnp.arange(BH * C * W, dtype=jnp.float32)
        .reshape(BH, C, W)
        .astype(dtype)
    )
    fstart, foff = 7, 7
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((SR, C, W), dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((10, C, W), dtype),
        interpret=INTERP,
    )(jnp.array([fstart, foff], jnp.int32), x)
    want = np.asarray(x.astype(jnp.float32))[fstart : fstart + 10]
    np.testing.assert_allclose(np.asarray(out.astype(jnp.float32)), want)
    return "exact"


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        run(f"g1 {tag} unaligned start, 16 rows",
            lambda dt=dt: _plane_window(dt, 16, align=False))
        run(f"g2 {tag} aligned start,   24 rows",
            lambda dt=dt: _plane_window(dt, 24, align=True))
        run(f"g4 {tag} dyn row-offset slab dest",
            lambda dt=dt: g4_dynamic_row_offset_dest(dt))


if __name__ == "__main__":
    main()
