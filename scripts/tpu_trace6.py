"""Round-2 trace: lite 4K with the HCW conv kernel active.

Captures a device trace of one lite-4K forward (distinct frames,
on-device generated) and prints the per-op-category time breakdown via
utils/profiling.py — locates where the remaining 585 ms lives after
the conv-kernel integration.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_trace6.py \
       [variant] [H] [W]     (defaults: lite 2176 3840)
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

from atmvfi_tpu.models import Network, get_config
from atmvfi_tpu.utils import profiling

variant = sys.argv[1] if len(sys.argv) > 1 else "lite"
cfg = get_config(variant, dtype=jnp.bfloat16)
net = Network(cfg)
dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
variables = jax.jit(
    lambda a, b: net.init(jax.random.PRNGKey(0), a, b, global_motion=True)
)(dummy, dummy)
jax.block_until_ready(variables)

h = int(sys.argv[2]) if len(sys.argv) > 2 else 2176
w = int(sys.argv[3]) if len(sys.argv) > 3 else 3840
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
gen = jax.jit(lambda k1, k2: (
    jax.random.uniform(k1, (1, h, w, 3), jnp.float32),
    jnp.roll(jax.random.uniform(k1, (1, h, w, 3), jnp.float32),
             (8, -8), (1, 2)) * 0.7
    + 0.3 * jax.random.uniform(k2, (1, h, w, 3), jnp.float32),
))
x0, x1 = gen(k1, k2)

fwd = jax.jit(lambda v, a, b: net.apply(v, a, b, global_motion=True)["I_t"])
print(float(fwd(variables, x0, x1).mean()), flush=True)  # compile + fence

trace_dir = f"/tmp/jax_trace_{variant}_{h}x{w}"
profiling.capture(
    lambda: float(fwd(variables, x0, x1).mean()),
    trace_dir=trace_dir,
)
profiling.print_summary(profiling.summarize(trace_dir, top=25))
