import time
import numpy as np
import jax, jax.numpy as jnp
from atmvfi_tpu.ops.resize import resize_bilinear
from atmvfi_tpu.ops import warp_pallas as wp

rng = np.random.default_rng(0)
H, W, C = 1088, 1920, 3
coarse = rng.standard_normal((1, H//64, W//64, 2)).astype(np.float32) * 8.0
fl = resize_bilinear(jnp.asarray(coarse), H, W)
img = jnp.asarray(rng.random((1, H, W, C)), jnp.float32)

# replicate ok computation
B, S = 1, 32
BH = H
n_th, n_tw = BH // 8, W // 128
ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
x0 = jnp.floor(jnp.asarray(xs[None], jnp.float32) + fl[..., 0]).astype(jnp.int32)
y0 = jnp.floor(jnp.asarray(ys[None], jnp.float32) + fl[..., 1]).astype(jnp.int32)
x0c = jnp.clip(x0, 0, W - 1).reshape(BH, W)
y0g = jnp.clip(y0, 0, H - 1).reshape(BH, W)
ymin_t, ymax_t = wp._tile_minmax(y0g, n_th, n_tw)
xmin_t, xmax_t = wp._tile_minmax(x0c, n_th, n_tw)
ymin_blk = jnp.clip(ymin_t // 8, 0, (BH - S) // 8)
xmin_blk = jnp.clip(xmin_t // 128, 0, W // 128 - 2)
ok_y = jnp.all(ymax_t + 1 - ymin_blk * 8 <= S - 1)
ok_x = jnp.all(xmax_t + 1 - xmin_blk * 128 <= 255)
print("ok_y:", bool(ok_y), "ok_x:", bool(ok_x), flush=True)

# force the pallas path directly
img_chw = img.reshape(BH, W, C).transpose(2, 0, 1)
flow_f = fl.astype(jnp.float32).reshape(BH, W, 2)
f = jax.jit(lambda a, b, c, d: wp._pallas_path(a, b, c, d, H=H, W=W, C=C, S=S, B=1, dtype=jnp.float32))
out = f(img_chw, flow_f, ymin_blk.reshape(-1), xmin_blk.reshape(-1))
out.block_until_ready()
t0 = time.time()
for _ in range(20):
    out = f(img_chw, flow_f, ymin_blk.reshape(-1), xmin_blk.reshape(-1))
out.block_until_ready()
print(f"pallas path raw: {(time.time()-t0)/20*1000:.2f} ms", flush=True)
