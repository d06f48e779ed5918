import time
import numpy as np
import jax, jax.numpy as jnp
from atmvfi_tpu.models import Network, get_config
for variant in ["base", "lite"]:
    cfg = get_config(variant, dtype=jnp.bfloat16)
    net = Network(cfg)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda a, b: net.init(jax.random.PRNGKey(0), a, b, global_motion=True))(dummy, dummy)
    jax.block_until_ready(variables)
    fwd = jax.jit(lambda v, a, b: net.apply(v, a, b, global_motion=True)["I_t"])
    for hw, n in [((1088,1920), 8), ((2176,3840), 4)]:
        xs = [jnp.asarray(np.random.rand(1, *hw, 3), jnp.float32) for _ in range(n)]
        float(fwd(variables, xs[0], xs[0]).mean())
        float(fwd(variables, xs[1], xs[1]).mean())
        t0 = time.time()
        for x in xs:
            float(fwd(variables, x, x).mean())
        print(f"[{variant} {hw}] {(time.time()-t0)/n*1000:.1f} ms", flush=True)
