"""Quantify bf16-vs-f32 serving deviation on the bundled asset frames."""
import numpy as np
import jax, jax.numpy as jnp
from atmvfi_tpu.models import Network, get_config
from atmvfi_tpu.infer.padder import InputPadder
from atmvfi_tpu.utils.images import read_image

img0 = read_image("/root/reference/asset/example_frame0.png").astype(np.float32) / 255
img1 = read_image("/root/reference/asset/example_frame1.png").astype(np.float32) / 255
x0 = jnp.asarray(img0)[None]; x1 = jnp.asarray(img1)[None]
padder = InputPadder(x0.shape, 64)
x0, x1 = padder.pad(x0, x1)
print("input:", x0.shape, flush=True)

outs = {}
for dt in ["f32", "bf16"]:
    cfg = get_config("base", dtype=jnp.float32 if dt == "f32" else jnp.bfloat16)
    net = Network(cfg)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda a, b: net.init(jax.random.PRNGKey(0), a, b, global_motion=True))(dummy, dummy)
    fwd = jax.jit(lambda v, a, b: net.apply(v, a, b, global_motion=True)["I_t"].astype(jnp.float32))
    outs[dt] = np.asarray(fwd(variables, x0, x1))
    print(dt, "done", flush=True)

d = np.abs(outs["bf16"] - outs["f32"])
mse = ((outs["bf16"] - outs["f32"]) ** 2).mean()
psnr = -10 * np.log10(mse) if mse > 0 else float("inf")
print(f"bf16 vs f32: max {d.max():.5f} mean {d.mean():.6f} 'PSNR' {psnr:.2f} dB", flush=True)
