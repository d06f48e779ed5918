"""Mosaic capability probe #3: which +-1-lane-shift idiom compiles?

The HCW conv kernel needs x+-1 lane shifts of [C, W] VMEM rows. Probed
idioms (smallest kernels that exercise them, fast remote compiles):

  a) pltpu.roll along lanes, bf16      (known-failing: dynamic_rotate)
  b) pltpu.roll along lanes, f32
  c) adding two lane-offset slices (bf16) — auto-relayout on arithmetic?
  d) same, f32
  e) concat along sublanes of offset slices (known-failing reference)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/pallas_probe3.py
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 16, 512  # sublanes x lanes


def run(name, kernel, dtype):
    try:
        x = jnp.arange(R * C, dtype=jnp.float32).reshape(R, C).astype(dtype)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, 256), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        v = np.asarray(jax.jit(lambda o: o.astype(jnp.float32).sum())(out))
        print(f"  {name}: OK sum={v:.0f}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"  {name}: FAIL {msg}", flush=True)


def k_roll(x_ref, o_ref):
    r = pltpu.roll(x_ref[...], 1, 1)
    o_ref[...] = r[:, 128:384]


def k_slice_add(x_ref, o_ref):
    a = x_ref[:, 127:383]   # offset 127
    b = x_ref[:, 128:384]   # aligned
    c = x_ref[:, 129:385]   # offset 129 -> 1
    o_ref[...] = a + b + c


def k_concat(x_ref, o_ref):
    a = x_ref[:, 127:383]
    b = x_ref[:, 128:384]
    cat = jnp.concatenate([a, b], axis=0)  # [2R, 256]
    o_ref[...] = cat[:R] + cat[R:]


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    for dtype, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        run(f"lane-roll {tag}", k_roll, dtype)
        run(f"offset-slice-add {tag}", k_slice_add, dtype)
        run(f"offset-concat {tag}", k_concat, dtype)


if __name__ == "__main__":
    main()
