import time, numpy as np
import jax, jax.numpy as jnp
from atmvfi_tpu.models import Network, get_config
for variant in ["base", "lite"]:
    cfg = get_config(variant, dtype=jnp.bfloat16)
    net = Network(cfg)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda a, b: net.init(rng, a, b, global_motion=True))(dummy, dummy)
    jax.block_until_ready(variables)
    fwd = jax.jit(lambda v, a, b: net.apply(v, a, b, global_motion=True)["I_t"])
    for hw, n in [((1088,1920), 10), ((2176,3840), 5)]:
        x = jnp.asarray(np.random.rand(1, *hw, 3), jnp.float32)
        t0=time.time(); out = fwd(variables, x, x); out.block_until_ready()
        c = time.time()-t0
        t0 = time.time()
        for _ in range(n): out = fwd(variables, x, x)
        out.block_until_ready()
        dt=(time.time()-t0)/n
        print(f"[{variant}] {hw} compile {c:.0f}s steady {dt*1000:.1f} ms = {1/dt:.1f} fps", flush=True)
    if variant == "base":
        x = jnp.asarray(np.random.rand(1, 1088, 1920, 3), jnp.float32)
        with jax.profiler.trace("/tmp/jax_trace4"):
            out = fwd(variables, x, x); out.block_until_ready()
        print("trace written", flush=True)
