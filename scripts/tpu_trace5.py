import numpy as np
import jax, jax.numpy as jnp
from atmvfi_tpu.models import Network, get_config
cfg = get_config("base", dtype=jnp.bfloat16)
net = Network(cfg)
dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
variables = jax.jit(lambda a, b: net.init(jax.random.PRNGKey(0), a, b, global_motion=True))(dummy, dummy)
jax.block_until_ready(variables)
fwd = jax.jit(lambda v, a, b: net.apply(v, a, b, global_motion=True)["I_t"])
for tag, hw in [("t1080", (1088, 1920)), ("t4k", (2176, 3840))]:
    x = jnp.asarray(np.random.rand(1, *hw, 3), jnp.float32)
    out = fwd(variables, x, x); out.block_until_ready()
    with jax.profiler.trace(f"/tmp/jax_{tag}"):
        out = fwd(variables, x, x); out.block_until_ready()
    print(tag, "done", flush=True)
