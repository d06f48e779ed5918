"""Export a native .npz checkpoint to the reference's .pt format.

  python cli/export_checkpoint.py in.npz out.pt
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help="native .npz checkpoint")
    p.add_argument("dst", help="output .pt (reference wrapped format)")
    args = p.parse_args()

    from atmvfi_tpu.convert import save_torch_checkpoint
    from atmvfi_tpu.train.checkpoints import load_params_meta, load_params_npz

    variables = load_params_npz(args.src)
    meta = load_params_meta(args.src)
    save_torch_checkpoint(args.dst, variables, meta=meta)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
