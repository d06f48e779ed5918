"""Round-2 trace: lite 4K with the HCW conv kernel active.

Captures a device trace of one lite-4K forward (distinct frames,
on-device generated) and prints the per-op-category time breakdown via
utils/profiling.py — locates where the remaining 585 ms lives after
the conv-kernel integration.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_trace6.py
"""
import numpy as np

import jax
import jax.numpy as jnp

from atmvfi_tpu.models import Network, get_config
from atmvfi_tpu.utils import profiling

cfg = get_config("lite", dtype=jnp.bfloat16)
net = Network(cfg)
dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
variables = jax.jit(
    lambda a, b: net.init(jax.random.PRNGKey(0), a, b, global_motion=True)
)(dummy, dummy)
jax.block_until_ready(variables)

h, w = 2176, 3840
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

profiling.capture(
    lambda: float(fwd(variables, x0, x1).mean()),
    trace_dir="/tmp/jax_lite4k_r2",
)
profiling.print_summary(profiling.summarize("/tmp/jax_lite4k_r2", top=25))
