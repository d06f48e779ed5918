import time, numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
from atmvfi_tpu.models import Network, get_config
for variant in ["base", "lite"]:
    cfg = get_config(variant, dtype=jnp.bfloat16)
    net = Network(cfg)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    t0 = time.time()
    variables = jax.jit(lambda a, b: net.init(rng, a, b, global_motion=True))(dummy, dummy)
    jax.block_until_ready(variables)
    print(f"[{variant}] jitted init {time.time()-t0:.1f}s", flush=True)
    fwd = jax.jit(lambda v, a, b: net.apply(v, a, b, global_motion=True)["I_t"])
    for hw in [(512, 512), (1088, 1920), (2176, 3840)]:
        x = jnp.asarray(np.random.rand(1, *hw, 3), jnp.float32)
        try:
            t0 = time.time()
            out = fwd(variables, x, x); out.block_until_ready()
            print(f"[{variant}] {hw} compile+run {time.time()-t0:.1f}s", flush=True)
            n = 10 if hw[0] < 1000 else 5
            t0 = time.time()
            for _ in range(n):
                out = fwd(variables, x, x)
            out.block_until_ready()
            dt = (time.time()-t0)/n
            print(f"[{variant}] {hw} steady: {dt*1000:.1f} ms = {1/dt:.1f} fps", flush=True)
        except Exception as e:
            print(f"[{variant}] {hw} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
