import sys, time, numpy as np
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp
from atmvfi_tpu.train import Trainer, TrainerConfig, PHASE1
from atmvfi_tpu.ops.warp_pallas import resolve_warp_impl
print("backend:", jax.default_backend(), "auto warp:", resolve_warp_impl("auto", 3), flush=True)
tr = Trainer(TrainerConfig(phase=PHASE1, variant="lite", dtype=jnp.bfloat16, steps_per_epoch=4, num_epochs=1))
rng = np.random.default_rng(0)
B, H, W = 2, 256, 384  # W=384 -> tiled warp kernel active on TPU
mk = lambda: jnp.asarray(rng.random((B, H, W, 3), np.float32))
t0 = time.time()
state, metrics = tr._train_step(tr.state, mk(), mk(), mk())
jax.block_until_ready(metrics)
print(f"compile+step: {time.time()-t0:.0f}s loss={float(metrics['loss']):.4f}", flush=True)
losses = []
t0 = time.time()
for i in range(6):
    state, metrics = tr._train_step(state, mk(), mk(), mk())
    losses.append(float(metrics["loss"]))
print(f"6 steps: {(time.time()-t0)/6*1000:.0f} ms/step; losses {['%.4f'%l for l in losses]}", flush=True)
assert np.isfinite(losses).all()
print("TPU training with tiled-warp VJP: OK", flush=True)
