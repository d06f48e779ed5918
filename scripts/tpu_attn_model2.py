import dataclasses, time
import numpy as np
import jax, jax.numpy as jnp
from atmvfi_tpu.models import Network, get_config
for impl in ["xla", "pallas"]:
    cfg = dataclasses.replace(get_config("base", dtype=jnp.bfloat16), attention_impl=impl)
    net = Network(cfg)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda a, b: net.init(jax.random.PRNGKey(0), a, b, global_motion=True))(dummy, dummy)
    jax.block_until_ready(variables)
    fwd = jax.jit(lambda v, a, b: jnp.clip(net.apply(v, a, b, global_motion=True)["I_t"].astype(jnp.float32), 0.05, 0.95))
    for hw, n in [((1088, 1920), 8), ((2176, 3840), 4)]:
        a = jnp.asarray(np.random.rand(1, *hw, 3), jnp.float32)
        b = jnp.asarray(np.random.rand(1, *hw, 3), jnp.float32)
        out = fwd(variables, a, b); out.block_until_ready()
        t0 = time.time()
        x = a
        for _ in range(n):
            x = fwd(variables, x, b)   # chained dependency
        x.block_until_ready()
        print(f"[base {hw} attn={impl}] {(time.time()-t0)/n*1000:.1f} ms", flush=True)
