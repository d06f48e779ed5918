"""Mosaic probe 5c: the plane-DMA legality frontier, one constraint per
cell. probe5/5b established that BOTH sides of the planes DMA can be
rejected: the HBM source slice along a tiled row dim (shape + provable
start alignment) and the VMEM dest channel squeeze (probe4 p7 passed
at (8,8,128) but (24,8,256) fails). Cells:

SOURCE (dest is a FULL 2D slab, no dest slicing):
  s1 2D [64,256] src, 24-row window, start = clip(pid-1,0,5)*8
     (multiply-last provable form, dynamic via program_id)
  s2 same window but start from scalar-prefetch (value aligned,
     provenance unprovable) — expected FAIL, documents the rule
  s3 3D [2,64,256] src, integer plane squeeze + s1's row window
     (the real planes layout, provable start)

DEST (source static, channel-squeeze dest):
  d1 slab ( 8,8,128) static src rows  — probe4 p7 replica, expect OK
  d2 slab ( 8,8,256)                  — 2 lane tiles
  d3 slab (24,8,128)                  — 3 row blocks
  d4 slab (24,8,256)                  — known FAIL from 5b
  d5 slab (24,8,256), DMA split into 128-lane chunks

Run on the axon TPU: python -u scripts/pallas_probe5c.py
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


def _dst_probe(rows, W, chunked=False):
    def kernel(x_ref, o_ref, slab, sem):
        if chunked:
            for i, c0 in enumerate(range(0, W, 128)):
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(0, rows), pl.ds(c0, 128)],
                    slab.at[:, 1, pl.ds(c0, 128)],
                    sem.at[i],
                ).start()
            for i in range(W // 128):
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(0, rows), pl.ds(i * 128, 128)],
                    slab.at[:, 1, pl.ds(i * 128, 128)],
                    sem.at[i],
                ).wait()
        else:
            cp = pltpu.make_async_copy(
                x_ref.at[pl.ds(0, rows), :], slab.at[:, 1, :], sem.at[0]
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
                        pltpu.SemaphoreType.DMA((max(1, W // 128),))],
        interpret=INTERP,
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))
    return "exact"


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    run("s1 2D src provable dyn start ", lambda: _src_probe("s1"))
    run("s2 2D src scalar-arg start   ", lambda: _src_probe("s2"))
    run("s3 3D src squeeze + provable ", lambda: _src_probe("s3"))
    run("d1 slab( 8,8,128) ch-squeeze ", lambda: _dst_probe(8, 128))
    run("d2 slab( 8,8,256) ch-squeeze ", lambda: _dst_probe(8, 256))
    run("d3 slab(24,8,128) ch-squeeze ", lambda: _dst_probe(24, 128))
    run("d4 slab(24,8,256) ch-squeeze ", lambda: _dst_probe(24, 256))
    run("d5 slab(24,8,256) 128-chunked", lambda: _dst_probe(24, 256, True))


if __name__ == "__main__":
    main()
