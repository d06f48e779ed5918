import functools, time
import numpy as np
import jax, jax.numpy as jnp
from atmvfi_tpu.ops.resize import resize_bilinear
from atmvfi_tpu.ops.warp_pallas import flow_warp_tiled

rng = np.random.default_rng(0)
for H, W in [(1088, 1920), (2176, 3840)]:
    img = jnp.asarray(rng.random((1, H, W, 3)), jnp.bfloat16)
    coarse = rng.standard_normal((1, H//64, W//64, 2)).astype(np.float32) * 8
    fls = [jnp.asarray(np.asarray(resize_bilinear(jnp.asarray(coarse + s*0.01), H, W))) for s in range(8)]
    for name, f in [("checked", jax.jit(flow_warp_tiled)),
                    ("unchecked", jax.jit(functools.partial(flow_warp_tiled, unchecked=True)))]:
        float(f(img, fls[0]).mean()); float(f(img, fls[1]).mean())
        t0 = time.time()
        for fl in fls:
            float(f(img, fl).mean())
        print(f"{name} {H}x{W}: {(time.time()-t0)/8*1000:.2f} ms/warp", flush=True)
