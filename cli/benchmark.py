"""Benchmark CLI: run the Vimeo/UCF/SNU/Xiph harnesses.

Example:
  python cli/benchmark.py --dataset vimeo90k --path /data/vimeo_triplet \
      --ckpt vimeo_epoch_254_psnr_36.3847.pt --model_type base
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True,
                   choices=["vimeo90k", "ucf101", "snufilm", "xiph"])
    p.add_argument("--path", required=True)
    p.add_argument("--img_data_path", default="", help="SNU image root")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--model_type", choices=["base", "lite"], default="base")
    p.add_argument("--TTA", action="store_true")
    p.add_argument("--TTA_swaporder", action="store_true")
    p.add_argument("--ensemble_global", action="store_true")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--profiling", action="store_true",
                   help="suppress per-item progress prints so external "
                        "timing isn't skewed (test_vimeo90k.py:62 parity); "
                        "runners always report seconds/fps in the result")
    p.add_argument("--seed", type=int, default=22112023)
    args = p.parse_args()

    import jax.numpy as jnp

    from atmvfi_tpu.evalkit import harness
    from atmvfi_tpu.infer.pipeline import load_pipeline
    from atmvfi_tpu.utils import seed_all

    seed_all(args.seed)
    # per-dataset protocol: global motion off for Vimeo/UCF
    # (test_vimeo90k.py:74, test_ucf101.py:70), on for SNU/Xiph
    global_motion = args.dataset in ("snufilm", "xiph")
    pipeline = load_pipeline(
        args.ckpt, variant=args.model_type,
        dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
        global_motion=global_motion,
        ensemble_global_motion=args.ensemble_global,
        pad_divisor=32 if args.dataset == "xiph" else 64,
    )

    if args.dataset == "vimeo90k":
        res = harness.run_vimeo90k(pipeline, args.path, args.TTA, args.limit,
                                   progress=not args.profiling,
                                   tta_swaporder=args.TTA_swaporder)
    elif args.dataset == "ucf101":
        res = harness.run_ucf101(pipeline, args.path, args.TTA, args.limit)
    elif args.dataset == "snufilm":
        res = harness.run_snufilm(pipeline, args.path, args.img_data_path,
                                  tta=args.TTA, limit=args.limit)
    else:
        res = harness.run_xiph(pipeline, args.path, tta=args.TTA,
                               frame_limit=args.limit)
    print()
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
