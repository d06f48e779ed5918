import time, numpy as np
import jax, jax.numpy as jnp
from atmvfi_tpu.models import Network, get_config
cfg = get_config("base", dtype=jnp.bfloat16)
net = Network(cfg)
rng = jax.random.PRNGKey(0)
dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
variables = jax.jit(lambda a, b: net.init(rng, a, b, global_motion=True))(dummy, dummy)
jax.block_until_ready(variables)
print("init done", flush=True)
fwd = jax.jit(lambda v, a, b: net.apply(v, a, b, global_motion=True)["I_t"])
x = jnp.asarray(np.random.rand(1, 1088, 1920, 3), jnp.float32)
out = fwd(variables, x, x); out.block_until_ready()
print("compiled", flush=True)
# timing: serialized via chained dependency
t0 = time.time()
y = x
for _ in range(5):
    o = fwd(variables, y, y)
    y = jnp.clip(o, 0, 1)  # chain
y.block_until_ready()
print(f"chained steady: {(time.time()-t0)/5*1000:.1f} ms/frame", flush=True)
try:
    with jax.profiler.trace("/tmp/jax_trace"):
        out = fwd(variables, x, x); out.block_until_ready()
    print("trace written", flush=True)
except Exception as e:
    print("profiler failed:", e, flush=True)
