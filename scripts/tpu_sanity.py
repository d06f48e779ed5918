import time
import numpy as np
import jax, jax.numpy as jnp
from atmvfi_tpu.models import Network, get_config
cfg = get_config("base", dtype=jnp.bfloat16)
net = Network(cfg)
dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
variables = jax.jit(lambda a, b: net.init(jax.random.PRNGKey(0), a, b, global_motion=True))(dummy, dummy)
jax.block_until_ready(variables)
fwd = jax.jit(lambda v, a, b: jnp.clip(net.apply(v, a, b, global_motion=True)["I_t"].astype(jnp.float32), 0.05, 0.95))
a = jnp.asarray(np.random.rand(1, 1088, 1920, 3), jnp.float32)
b = jnp.asarray(np.random.rand(1, 1088, 1920, 3), jnp.float32)
out = fwd(variables, a, b); out.block_until_ready()
x = a
t0 = time.time()
for i in range(4):
    x = fwd(variables, x, b)
    s = float(x.sum())   # forces a device->host readback each iter
    print(f"iter {i}: sum={s:.4f} elapsed={time.time()-t0:.3f}s", flush=True)
