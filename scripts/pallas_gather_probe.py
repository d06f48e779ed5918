"""Probe Mosaic support for in-kernel gather patterns."""
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
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)

# 1. sublane gather: out[i,l] = table[idx[i,l], l]
def k1(table_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)
def p1():
    table = jnp.arange(256*128, dtype=jnp.float32).reshape(256, 128)
    idx = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32)[:, None]*7 % 256, (8,128))
    return pl.pallas_call(k1,
        out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(table, idx)
probe("sublane take_along_axis(axis=0)", p1)

# 2. lane gather: out[i,l] = row[i, idx[i,l]]
def k2(row_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(row_ref[:], idx_ref[:], axis=1)
def p2():
    row = jnp.arange(8*128, dtype=jnp.float32).reshape(8, 128)
    idx = jnp.broadcast_to((jnp.arange(128, dtype=jnp.int32)*13) % 128, (8,128))
    return pl.pallas_call(k2,
        out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(row, idx)
probe("lane take_along_axis(axis=1)", p2)

# 3. bigger sublane gather from a [2048, 128] table
def k3(table_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)
def p3():
    table = jnp.arange(2048*128, dtype=jnp.float32).reshape(2048, 128)
    idx = jnp.broadcast_to((jnp.arange(64, dtype=jnp.int32)[:, None]*31) % 2048, (64,128))
    return pl.pallas_call(k3,
        out_shape=jax.ShapeDtypeStruct((64,128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(table, idx)
probe("large sublane gather 2048-table", p3)

# 4. jnp.take flat
def k4(table_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(table_ref[:].reshape(-1), idx_ref[:], axis=0)
def p4():
    table = jnp.arange(256*128, dtype=jnp.float32).reshape(256, 128)
    idx = ((jnp.arange(8*128, dtype=jnp.int32)*997) % (256*128)).reshape(8,128)
    return pl.pallas_call(k4,
        out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(table, idx)
probe("flat jnp.take", p4)
