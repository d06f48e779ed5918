import time, numpy as np
import jax, jax.numpy as jnp
from atmvfi_tpu.ops.attention_pallas import fused_window_attention, reference_window_attention
from atmvfi_tpu import ops

# correctness on real TPU, real shapes
for (N, d, win) in [(64, 48, 8), (144, 84, 12)]:
    rng = np.random.default_rng(0)
    BW, h = 510, 8
    q, k, v = (jnp.asarray(rng.standard_normal((BW, h, N, d)), jnp.bfloat16) for _ in range(3))
    rel = ops.relative_coords(win)
    m = np.zeros((BW, N, N), np.float32); m[:, :N//2, N//2:] = -100.0
    mask = jnp.asarray(m)
    f_pal = jax.jit(lambda q,k,v: fused_window_attention(q, k, v, d**-0.5, rel, mask, 8, False))
    f_ref = jax.jit(lambda q,k,v: reference_window_attention(q, k, v, d**-0.5, rel, mask))
    o1, m1 = f_pal(q, k, v); o2, m2 = f_ref(q, k, v)
    jax.block_until_ready((o1, m1, o2, m2))
    print(f"N={N} d={d}: out diff {float(jnp.abs(o1.astype(jnp.float32)-o2.astype(jnp.float32)).max()):.2e} "
          f"motion diff {float(jnp.abs(m1.astype(jnp.float32)-m2.astype(jnp.float32)).max()):.2e}", flush=True)
    # speed
    for name, f in [("pallas", f_pal), ("xla", f_ref)]:
        outs = f(q,k,v); jax.block_until_ready(outs)
        t0 = time.time()
        for _ in range(50): outs = f(q,k,v)
        jax.block_until_ready(outs)
        print(f"  {name}: {(time.time()-t0)/50*1000:.3f} ms", flush=True)

# model-level: base 1080p pallas vs xla
from atmvfi_tpu.models import Network, get_config
import dataclasses
for impl in ["xla", "pallas"]:
    cfg = dataclasses.replace(get_config("base", dtype=jnp.bfloat16), attention_impl=impl)
    net = Network(cfg)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda a, b: net.init(jax.random.PRNGKey(0), a, b, global_motion=True))(dummy, dummy)
    jax.block_until_ready(variables)
    fwd = jax.jit(lambda v, a, b: net.apply(v, a, b, global_motion=True)["I_t"])
    xs = [jnp.asarray(np.random.rand(1, 1088, 1920, 3), jnp.float32) for _ in range(8)]
    out = fwd(variables, xs[0], xs[0]); out.block_until_ready()
    t0 = time.time()
    outs = [fwd(variables, x, x) for x in xs]
    jax.block_until_ready(outs)
    print(f"[base 1080p {impl}] {(time.time()-t0)/8*1000:.1f} ms", flush=True)
