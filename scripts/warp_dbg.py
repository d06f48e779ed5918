import numpy as np
import jax, jax.numpy as jnp
from atmvfi_tpu.ops.resize import resize_bilinear
from atmvfi_tpu.ops import warp_pallas as wp
from atmvfi_tpu.ops import warp as warp_xla

rng = np.random.default_rng(0)
B, H, W, C = 1, 256, 384, 3
feat = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
coarse = rng.standard_normal((1, H//64, W//64, 2)).astype(np.float32) * 6.0
fl = resize_bilinear(jnp.asarray(coarse), H, W)
got = np.asarray(jax.jit(wp.flow_warp_tiled)(feat, fl))
want = np.asarray(jax.jit(warp_xla.flow_warp)(feat, fl))
d = np.abs(got - want).max(axis=-1)[0]
print("max diff:", d.max(), "bad pixels:", int((d > 1e-5).sum()), "/", d.size, flush=True)
ys, xs = np.nonzero(d > 1e-5)
if len(ys):
    print("rows range:", ys.min(), ys.max(), "cols range:", xs.min(), xs.max(), flush=True)
    print("unique tile rows:", np.unique(ys // 8)[:20], flush=True)
    print("unique tile cols:", np.unique(xs // 128), flush=True)
    i = 0
    y, x = ys[i], xs[i]
    print("sample bad pixel", y, x, "flow:", np.asarray(fl)[0, y, x], "got:", got[0,y,x], "want:", want[0,y,x], flush=True)
