"""Probe: wide lane gather + scalar-prefetch-driven block index_map."""
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def probe(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"{name}: OK {np.asarray(out).ravel()[:4]}", flush=True)
    except Exception as e:
        msg = (str(e).splitlines() or ["<empty>"])[0][:150]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)

# 1. lane gather 256 -> 128
def k1(row_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(
        jnp.broadcast_to(row_ref[:], (8, 256)), idx_ref[:], axis=1)
def p1():
    row = jnp.arange(256, dtype=jnp.float32).reshape(1, 256)
    idx = jnp.broadcast_to((jnp.arange(128, dtype=jnp.int32) * 2) % 256, (8, 128))
    return pl.pallas_call(k1,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(row, idx)
probe("lane gather 256->128", p1)

# 1b. lane gather on [8,256] with idx [8,256] (equal width, then slice)
def k1b(row_ref, idx_ref, out_ref):
    g = jnp.take_along_axis(row_ref[:], idx_ref[:], axis=1)
    out_ref[:] = g[:, :128]
def p1b():
    row = jnp.broadcast_to(jnp.arange(256, dtype=jnp.float32), (8, 256))
    idx = jnp.broadcast_to((jnp.arange(256, dtype=jnp.int32) * 3) % 256, (8, 256))
    return pl.pallas_call(k1b,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(row, idx)
probe("lane gather 256 equal-width", p1b)

# 2. scalar-prefetch block index_map
def k2(smin_ref, x_ref, out_ref):
    out_ref[:] = x_ref[:] * 2.0
def p2():
    x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    smin = jnp.asarray([2, 0], jnp.int32)  # block row to fetch per step
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(2,),
        in_specs=[pl.BlockSpec((8, 128), lambda i, smin: (smin[i], 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i, smin: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(k2,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        grid_spec=grid_spec)(smin, x)
probe("scalar-prefetch index_map", p2)

# 3. bf16 lane gather
def k3(row_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(row_ref[:], idx_ref[:], axis=1)
def p3():
    row = jnp.broadcast_to(jnp.arange(128, dtype=jnp.bfloat16), (8, 128))
    idx = jnp.broadcast_to((jnp.arange(128, dtype=jnp.int32) * 5) % 128, (8, 128))
    return pl.pallas_call(k3,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(row, idx)
probe("bf16 lane gather", p3)

# 4. lane gather with (16,256) f32 (multi-sublane-tile)
def k4(row_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(row_ref[:], idx_ref[:], axis=1)
def p4():
    row = jnp.broadcast_to(jnp.arange(512, dtype=jnp.float32), (16, 512))
    idx = jnp.broadcast_to((jnp.arange(512, dtype=jnp.int32) * 7) % 512, (16, 512))
    return pl.pallas_call(k4,
        out_shape=jax.ShapeDtypeStruct((16, 512), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(row, idx)
probe("lane gather width 512", p4)
