"""Small-scale training convergence evidence (round-5 VERDICT item 8).

Runs the 4-phase recipe's first two phases end-to-end on synthetic-
motion data (256x384 crops sliding along random per-sample vectors
over the reference asset textures — real translational motion, so the
model must learn to estimate and halve flow):

  phase 1 (local branch from scratch, global off)   — N1 steps
  phase 2 (global branch, LOCAL FROZEN, global on)  — N2 steps,
           initialized from the phase-1 params

and records loss/PSNR curves + the phase-2 freeze check (local-branch
param hash unchanged, global-branch hash changed). Writes
docs/convergence_r5.json; tests/test_convergence.py asserts the
committed curves' properties (monotone trend, freeze integrity).

Run (exclusive, TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python -u scripts/tpu_train_convergence.py [--steps1 N] [--steps2 N]
"""
import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

from atmvfi_tpu.train import PHASE1, PHASE2, Trainer, TrainerConfig

H, W, B = 256, 384, 4


def make_canvases():
    """Texture canvases: the two asset frames (real image statistics)
    plus two smoothed-noise fields, all 600x960 RGB f32 in [0, 1]."""
    from PIL import Image

    canv = []
    for p in ("/root/reference/asset/example_frame0.png",
              "/root/reference/asset/example_frame1.png"):
        img = Image.open(p).convert("RGB").resize((960, 600), Image.BILINEAR)
        canv.append(np.asarray(img, np.float32) / 255.0)
    rng = np.random.default_rng(3)
    for _ in range(2):
        n = rng.random((600 // 4, 960 // 4, 3)).astype(np.float32)
        n = np.asarray(
            Image.fromarray((n * 255).astype(np.uint8)).resize(
                (960, 600), Image.BILINEAR
            ),
            np.float32,
        ) / 255.0
        canv.append(n)
    return canv


def batch_stream(seed, dmin=1, dmax=8):
    """Yields (im0, gt, im1) f32 batches with per-sample random motion
    vectors, |d| in [dmin, dmax] px per half-step. Phase 1 uses small
    motion (local branch range: the 8x8 window at 1/8 res covers
    ~+-56 px); phase 2 uses LARGE motion beyond that range, so the
    global pre-alignment branch — the only thing phase 2 trains — has
    signal to learn (with small motion it is provably inert and the
    curve is flat)."""
    canv = make_canvases()
    rng = np.random.default_rng(seed)
    while True:
        im0 = np.empty((B, H, W, 3), np.float32)
        gt = np.empty_like(im0)
        im1 = np.empty_like(im0)
        for b in range(B):
            c = canv[rng.integers(len(canv))]
            mag = int(rng.integers(dmin, dmax + 1))
            ang = rng.uniform(0, 2 * np.pi)
            dx = int(round(mag * np.cos(ang)))
            dy = int(round(mag * np.sin(ang) * 0.5))  # H headroom
            cx = int(rng.integers(8, c.shape[1] - W - 8 - 2 * abs(dx)))
            cy = int(rng.integers(8, c.shape[0] - H - 8 - 2 * abs(dy)))
            cx, cy = cx + abs(dx), cy + abs(dy)
            for t, dst in ((-1, im0), (0, gt), (1, im1)):
                x, y = cx + t * dx, cy + t * dy
                dst[b] = c[y : y + H, x : x + W]
        yield jnp.asarray(im0), jnp.asarray(gt), jnp.asarray(im1)


def masked_hash(params, mask, want) -> str:
    """sha256 over the leaves whose trainable_mask value == want —
    the SAME mask the optimizer's multi_transform freezes by
    (train/phases.py trainable_mask), so this checks the actual freeze
    surface, not a hand-maintained key list."""
    flat_p = jax.tree_util.tree_leaves_with_path(params)
    flat_m = jax.tree_util.tree_leaves(mask)
    h = hashlib.sha256()
    for (path, leaf), m in zip(flat_p, flat_m):
        if m == want:
            h.update(str(path).encode())
            h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()[:16]


def run_phase(phase, steps, init_params, seed, log_every=25,
              dmin=1, dmax=8):
    tr = Trainer(
        TrainerConfig(
            phase=phase, variant="lite", dtype=jnp.bfloat16,
            steps_per_epoch=steps, num_epochs=1, seed=seed,
        ),
        init_variables=(
            None if init_params is None else {"params": init_params}
        ),
    )
    stream = batch_stream(seed + 100, dmin, dmax)
    # FIXED held-out eval batches: per-step train metrics are
    # confounded by random batch difficulty (PSNR swings several dB
    # with the sampled motion magnitude); the curve that must be
    # monotone is eval-on-identical-data
    eval_stream = batch_stream(seed + 999, dmin, dmax)
    eval_batches = [next(eval_stream) for _ in range(4)]

    def evaluate(params):
        ms = [tr._eval_step(params, b[0], b[1], b[2])
              for b in eval_batches]
        return (float(np.mean([float(m["loss"]) for m in ms])),
                float(np.mean([float(m["psnr"]) for m in ms])))

    curve = []
    state = tr.state
    t0 = time.time()
    for i in range(steps):
        im0, gt, im1 = next(stream)
        state, metrics = tr._train_step(state, im0, gt, im1)
        if i % log_every == 0 or i == steps - 1:
            el, ep = evaluate(state.params)
            curve.append(
                {"step": i, "loss": float(metrics["loss"]),
                 "psnr": float(metrics["psnr"]),
                 "eval_loss": el, "eval_psnr": ep}
            )
            print(f"  {phase.name} step {i:4d}: train loss "
                  f"{curve[-1]['loss']:.4f} | EVAL loss {el:.4f} "
                  f"psnr {ep:.2f} ({time.time()-t0:.0f}s)", flush=True)
    return state, curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps1", type=int, default=300)
    ap.add_argument("--steps2", type=int, default=1200)
    # reference phase-2 LR is 2e-4 at batch 24 (train.py:56); at this
    # run's batch 4 the unscaled LR DIVERGES the moment warmup ends
    # (measured: eval collapses to a saturated constant at step ~2000)
    # — linear batch-size scaling gives ~3e-5
    ap.add_argument("--lr2", type=float, default=3e-5)
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}", flush=True)

    from atmvfi_tpu.train.phases import trainable_mask

    state1, curve1 = run_phase(PHASE1, args.steps1, None, seed=11)
    p1 = jax.device_get(state1.params)
    mask2 = trainable_mask(p1, PHASE2.train_local, PHASE2.train_global,
                           PHASE2.refiner_only)
    local_h1 = masked_hash(p1, mask2, False)   # frozen under phase 2
    global_h1 = masked_hash(p1, mask2, True)   # trained under phase 2

    # phase 2: large motion (24-80 px > the local window range) so the
    # global branch it trains has signal; longer run because the
    # reference warmup (2000 steps, phases.py PHASE2) ramps slowly
    import dataclasses
    phase2 = dataclasses.replace(
        PHASE2, init_lr=args.lr2, last_lr=args.lr2 / 3,
        warmup_steps=200,
    )
    state2, curve2 = run_phase(phase2, args.steps2, p1, seed=22,
                               dmin=24, dmax=80)
    p2 = jax.device_get(state2.params)
    local_h2 = masked_hash(p2, mask2, False)
    global_h2 = masked_hash(p2, mask2, True)

    result = {
        "config": {"variant": "lite", "dtype": "bfloat16", "B": B,
                   "H": H, "W": W, "steps1": args.steps1,
                   "steps2": args.steps2, "lr2": args.lr2,
                   "lr2_note": "batch-scaled from the reference's 2e-4@bs24",
                   "data": "synthetic translational motion, asset + "
                           "smoothed-noise canvases; phase1 |d| 1-8 px, "
                           "phase2 24-80 px (beyond local range)"},
        "phase1": curve1,
        "phase2": curve2,
        "phase2_freeze": {
            "local_hash_before": local_h1, "local_hash_after": local_h2,
            "local_frozen": local_h1 == local_h2,
            "global_hash_before": global_h1,
            "global_hash_after": global_h2,
            "global_trained": global_h1 != global_h2,
        },
        "device": str(jax.devices()[0]),
    }

    def head_tail(curve, key):
        k = max(len(curve) // 5, 1)
        return (float(np.mean([c[key] for c in curve[:k]])),
                float(np.mean([c[key] for c in curve[-k:]])))

    for name, curve in (("phase1", curve1), ("phase2", curve2)):
        l0, l1 = head_tail(curve, "eval_loss")
        q0, q1 = head_tail(curve, "eval_psnr")
        result[f"{name}_summary"] = {
            "loss_first20pct": l0, "loss_last20pct": l1,
            "psnr_first20pct": q0, "psnr_last20pct": q1,
        }
        print(f"{name}: loss {l0:.4f} -> {l1:.4f}, "
              f"psnr {q0:.2f} -> {q1:.2f}", flush=True)

    assert result["phase2_freeze"]["local_frozen"], "phase-2 local leak!"
    assert result["phase2_freeze"]["global_trained"], "phase-2 global inert!"

    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "convergence_r5.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
