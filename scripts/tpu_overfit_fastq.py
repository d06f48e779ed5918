"""Overfit-then-measure: fast-profile deviation at non-trivial flows.

VERDICT r2 item 7: the --fast quality bound was only measured at
random init, where global flows are tiny and the fast profile's
`compose_full_res_warps` approximation is flattered. No trained
checkpoint exists in this environment (the reference ships none), so
this script manufactures non-degenerate weights the honest way:
overfit the lite model on synthetic global-translation triplets
(gt = the true intermediate frame of a rolled pair), which drives the
global/local flow heads to real magnitudes, then measures
fast-vs-exact PSNR at 1088x1920 and 2176x3840 on the asset frames and
on a high-motion synthetic pair (roll (24, -32)).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/tpu_overfit_fastq.py [steps]
"""
import sys
import time

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from atmvfi_tpu.models import Network, get_config
from atmvfi_tpu.train import PHASE1, Trainer, TrainerConfig
from atmvfi_tpu.train.checkpoints import save_params_npz

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
# global translations (dy, dx) in px at the TRAIN res; im1 is rolled by
# 2*(dy, dx) and gt by (dy, dx) — the exact t=0.5 intermediate
SHIFTS = ((12, -18), (20, 10), (-16, 24), (6, 30))


def load_frame(i, h, w):
    im = Image.open(
        f"/root/reference/asset/example_frame{i}.png"
    ).convert("RGB").resize((w, h), Image.BILINEAR)
    return jnp.asarray(np.asarray(im, np.float32) / 255.0)[None]


def main():
    print(f"device: {jax.devices()[0]}", flush=True)

    # ---- overfit at 256x512 (H%64, W%128 so the slab warps engage)
    th, tw = 256, 512
    base = load_frame(0, th, tw)
    triplets = []
    for dy, dx in SHIFTS:
        triplets.append((
            base,
            jnp.roll(base, (dy, dx), (1, 2)),
            jnp.roll(base, (2 * dy, 2 * dx), (1, 2)),
        ))

    trainer = Trainer(TrainerConfig(
        phase=PHASE1, variant="lite", steps_per_epoch=STEPS,
        num_epochs=1,
    ))
    state = trainer.state
    t0 = time.time()
    for step in range(STEPS):
        im0, gt, im1 = triplets[step % len(SHIFTS)]
        state, metrics = trainer._train_step(state, im0, gt, im1)
        if step == 0:
            jax.block_until_ready(metrics)
            print(f"train-step compiled+run ({time.time()-t0:.0f}s)",
                  flush=True)
        if (step + 1) % 50 == 0:
            print(f"step {step+1}: loss={float(metrics['loss']):.4f} "
                  f"psnr={float(metrics['psnr']):.2f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    params = state.params
    save_params_npz("/tmp/overfit_lite.npz", {"params": params},
                    meta={"src": "tpu_overfit_fastq", "steps": STEPS})
    print("saved /tmp/overfit_lite.npz", flush=True)

    # ---- fast-vs-exact with the overfit weights
    cfg = get_config("lite", dtype=jnp.bfloat16)
    net_exact = Network(cfg)
    net_fast = Network(cfg.fast())
    variables = {"params": params}

    @jax.jit
    def psnr_pair(v, a, b):
        e = jnp.clip(net_exact.apply(v, a, b, global_motion=True)["I_t"],
                     0, 1)
        f = jnp.clip(net_fast.apply(v, a, b, global_motion=True)["I_t"],
                     0, 1)
        mse = jnp.mean((e - f) ** 2)
        return -10.0 * jnp.log10(mse + 1e-12)

    for h, w in ((1088, 1920), (2176, 3840)):
        a0, a1 = load_frame(0, h, w), load_frame(1, h, w)
        syn0 = a0
        syn1 = jnp.roll(a0, (24, -32), (1, 2))
        for tag, i0, i1 in (("asset", a0, a1), ("high-motion", syn0, syn1)):
            t0 = time.time()
            val = float(psnr_pair(variables, i0, i1))
            print(f"fastq {w}x{h} {tag:11s}: fast-vs-exact {val:.2f} dB "
                  f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
