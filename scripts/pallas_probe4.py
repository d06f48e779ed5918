"""Mosaic capability probe #4: dynamic control flow for a warp-kernel v2.

The tile-slab warp kernel's inner loop statically scans all 8 sublane
offsets per active q-block (3 rolls + 6 gathers per (ch, q, d)); for
smooth flows ~6/8 iterations contribute nothing. A v2 inner loop would
iterate s over the tile's ACTUAL row spread:

    rows_s = roll(slab[ch], r_lo + s, axis=0)[:8]   # srow = r_lo + i + s

needing, inside a TPU Pallas kernel:
  p1 lax.fori_loop with a DYNAMIC (traced scalar) trip count
  p2 pltpu.roll with a DYNAMIC shift amount
  p3 a full-slab [64, 384] f32 sublane roll (vs 8x [8, 384])
  p4 dynamic-start pl.ds on the sublane dim of a VMEM scratch read

Each probe compiles a minimal kernel and checks numerics vs numpy.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_probe4.py
"""
import functools
import os
import sys

import jax

if os.environ.get("PROBE_CPU") == "1":  # math check without hardware
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_pallas_call = pl.pallas_call


def pallas_call_maybe_interpret(*a, **k):
    if jax.default_backend() != "tpu":
        k.setdefault("interpret", True)
    return _pallas_call(*a, **k)


pl.pallas_call = pallas_call_maybe_interpret


def run(tag, fn):
    try:
        out = fn()
        print(f"  {tag}: OK {out}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:140]
        print(f"  {tag}: FAIL {type(e).__name__}: {msg}", flush=True)


def p1_dynamic_fori():
    def kernel(n_ref, x_ref, o_ref):
        def body(i, acc):
            return acc + x_ref[...] * (i + 1).astype(jnp.float32)

        o_ref[...] = jax.lax.fori_loop(0, n_ref[0], body,
                                       jnp.zeros_like(x_ref))

    x = jnp.ones((8, 128), jnp.float32)
    n = jnp.array([3], jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((8, 128), lambda i, n: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i, n: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(n, x)
    got = float(out[0, 0])
    assert got == 6.0, got  # 1+2+3
    return f"sum={got}"


def p2_dynamic_roll():
    def kernel(s_ref, x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], s_ref[0], 0)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    s = jnp.array([3], jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((8, 128), lambda i, s: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i, s: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(s, x)
    want = np.roll(np.asarray(x), 3, 0)
    np.testing.assert_allclose(np.asarray(out), want)
    return "exact"


def p3_big_roll():
    def kernel(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 5, 0)[:8]

    x = jnp.arange(64 * 384, dtype=jnp.float32).reshape(64, 384)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((64, 384), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 384), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 384), jnp.float32),
        grid=(),
    )(x)
    want = np.roll(np.asarray(x), 5, 0)[:8]
    np.testing.assert_allclose(np.asarray(out), want)
    return "exact"


def p4_dynamic_sublane_ds():
    def kernel(q_ref, x_ref, o_ref, scratch):
        scratch[...] = x_ref[...]
        o_ref[...] = scratch[pl.ds(q_ref[0] * 8, 8), :]

    x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    q = jnp.array([2], jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((64, 128), lambda i, q: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i, q: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((64, 128), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(q, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x)[16:24])
    return "exact"


def p4b_unaligned_dynamic_sublane_ds():
    """The v2 money op: an 8-row VMEM read at an UNALIGNED dynamic
    sublane start (slab row u_lo + u + i aligned to sublane i without
    any roll)."""

    def kernel(q_ref, x_ref, o_ref, scratch):
        scratch[...] = x_ref[...]
        o_ref[...] = scratch[pl.ds(q_ref[0], 8), :]

    x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    q = jnp.array([13], jnp.int32)  # deliberately not 8-aligned
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((64, 128), lambda i, q: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i, q: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((64, 128), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(q, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x)[13:21])
    return "exact"


def p6_v2_inner_loop():
    """Composite v2 inner loop: dynamic-bound fori, each iteration an
    unaligned dynamic sublane read + lane gather + row-match select."""

    def kernel(lo_ref, n_ref, x_ref, idx_ref, row_ref, o_ref, scratch):
        scratch[...] = x_ref[...]
        iota_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        def body(u, acc):
            rows = scratch[pl.ds(lo_ref[0] + u, 8), :]
            g = jnp.take_along_axis(rows, idx_ref[...], axis=1)
            match = (row_ref[...] - iota_i == lo_ref[0] + u)
            return acc + jnp.where(match, g, 0.0)

        o_ref[...] = jax.lax.fori_loop(
            0, n_ref[0], body, jnp.zeros((8, 128), jnp.float32)
        )

    S = 64
    x = jnp.arange(S * 128, dtype=jnp.float32).reshape(S, 128)
    # per-pixel source rows: row[i, l] = 9 + i + (l % 3)  (spread 3)
    iota_i = np.arange(8)[:, None] + np.zeros((1, 128), np.int64)
    row = (9 + iota_i + (np.arange(128)[None] % 3)).astype(np.int32)
    idx = ((np.arange(128)[None] * 7 + iota_i) % 128).astype(np.int32)
    lo = jnp.array([9], jnp.int32)   # min(row - i)
    n = jnp.array([3], jnp.int32)    # spread
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(1,),
            in_specs=[
                pl.BlockSpec((S, 128), lambda i, lo, n: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i, lo, n: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda i, lo, n: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i, lo, n: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((S, 128), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(lo, n, x, jnp.asarray(idx), jnp.asarray(row))
    xn = np.asarray(x)
    want = xn[row, idx]
    np.testing.assert_allclose(np.asarray(out), want)
    return "exact"


def p5_dynamic_roll_in_fori():
    """The actual v2 inner-loop shape: dynamic roll inside dynamic fori."""

    def kernel(n_ref, x_ref, o_ref):
        def body(s, acc):
            return acc + pltpu.roll(x_ref[...], s, 0)[:8]

        o_ref[...] = jax.lax.fori_loop(
            0, n_ref[0], body, jnp.zeros((8, 128), jnp.float32)
        )

    x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    n = jnp.array([2], jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((64, 128), lambda i, n: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i, n: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(n, x)
    xn = np.asarray(x)
    want = np.roll(xn, 0, 0)[:8] + np.roll(xn, 1, 0)[:8]
    np.testing.assert_allclose(np.asarray(out), want)
    return "exact"


def p7_plane_dma_into_sublane_slice():
    """Planar-image conv route precondition: DMA separate [BH, W] HBM
    planes into fixed-middle-index sublane slices of a [rows, C, W]
    VMEM scratch (so C=3 images can feed the HCW conv kernel without
    ever materializing an NHWC->HCW transpose)."""

    def kernel(a_ref, b_ref, o_ref, scratch, sem):
        cp0 = pltpu.make_async_copy(
            a_ref.at[pl.ds(0, 8), :], scratch.at[:, 0, :], sem.at[0]
        )
        cp1 = pltpu.make_async_copy(
            b_ref.at[pl.ds(0, 8), :], scratch.at[:, 1, :], sem.at[1]
        )
        cp0.start()
        cp1.start()
        cp0.wait()
        cp1.wait()
        o_ref[0] = scratch[:, 0, :]
        o_ref[1] = scratch[:, 1, :]

    a = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    b = -jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((2, 8, 128), lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, 8, 128), jnp.float32),
        grid=(),
        scratch_shapes=[pltpu.VMEM((8, 8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )(a, b)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(a))
    np.testing.assert_allclose(np.asarray(out)[1], np.asarray(b))
    return "exact"


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    run("p1 dynamic fori_loop trip count", p1_dynamic_fori)
    run("p2 dynamic-shift pltpu.roll     ", p2_dynamic_roll)
    run("p3 full-slab [64,384] roll      ", p3_big_roll)
    run("p4 dynamic sublane pl.ds read   ", p4_dynamic_sublane_ds)
    run("p4b UNALIGNED dynamic sublane ds", p4b_unaligned_dynamic_sublane_ds)
    run("p5 dynamic roll inside fori     ", p5_dynamic_roll_in_fori)
    run("p6 composite v2 inner loop      ", p6_v2_inner_loop)
    run("p7 plane DMA into sublane slice ", p7_plane_dma_into_sublane_slice)


if __name__ == "__main__":
    main()
