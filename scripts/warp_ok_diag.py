import numpy as np
import jax, jax.numpy as jnp
from atmvfi_tpu.ops.resize import resize_bilinear
from atmvfi_tpu.ops import warp_pallas as wp
from atmvfi_tpu.ops import warp as warp_xla
import time

rng = np.random.default_rng(0)
H, W, C = 1088, 1920, 3
coarse = rng.standard_normal((1, H//64, W//64, 2)).astype(np.float32) * 8.0
fl = resize_bilinear(jnp.asarray(coarse), H, W)
img = jnp.asarray(rng.random((1, H, W, C)), jnp.float32)

# instrument: copy of the wrapper's ok computation
B, S = 1, 32
BH, n_th, n_tw = H, H//8, W//128
ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
x0 = jnp.floor(jnp.asarray(xs[None], jnp.float32) + fl[..., 0]).astype(jnp.int32)
y0 = jnp.floor(jnp.asarray(ys[None], jnp.float32) + fl[..., 1]).astype(jnp.int32)
x0c = jnp.clip(x0, 0, W - 1).reshape(BH, W)
y0g = jnp.clip(y0, 0, H - 1).reshape(BH, W)
ymax_eff = (y0g + (y0.reshape(BH, W) + 1 <= H - 1)).astype(jnp.int32)
xmax_eff = (x0c + (x0.reshape(BH, W) + 1 <= W - 1)).astype(jnp.int32)
ymin_t, _ = wp._tile_minmax(y0g, n_th, n_tw)
xmin_t, _ = wp._tile_minmax(x0c, n_th, n_tw)
_, ymax_t = wp._tile_minmax(ymax_eff, n_th, n_tw)
_, xmax_t = wp._tile_minmax(xmax_eff, n_th, n_tw)
ymin_blk = jnp.clip(ymin_t // 8, 0, (BH - S) // 8)
xmin_blk = jnp.clip(xmin_t // 128, 0, W // 128 - 2)
dy = ymax_t - ymin_blk * 8
dx = xmax_t - xmin_blk * 128
print("ok_y:", bool(jnp.all(dy <= S - 1)), "worst dy:", int(dy.max()), flush=True)
print("ok_x:", bool(jnp.all(dx <= 255)), "worst dx:", int(dx.max()), flush=True)
bad = jnp.argmax(dx)
print("bad tile:", int(bad)//n_tw, int(bad)%n_tw, "xmin_t:", int(xmin_t.reshape(-1)[bad]), "xmax_t:", int(xmax_t.reshape(-1)[bad]), "xmin_blk:", int(xmin_blk.reshape(-1)[bad]), flush=True)
# timing of the wrapped op
f = jax.jit(wp.flow_warp_tiled)
out = f(img, fl); out.block_until_ready()
t0=time.time()
for _ in range(20): out = f(img, fl)
out.block_until_ready()
print(f"wrapped: {(time.time()-t0)/20*1000:.2f} ms", flush=True)
