"""Generate a demo-CLI golden set from the torch reference (CPU).

Builds the torch-seed-7 random-init reference model (base or lite,
reference network_base.py / network_lite.py), saves a wrapped
checkpoint, resizes the reference asset frames to the target
resolution, runs the reference forward, and writes the golden I_t.
The verify flow (.claude/skills/verify) compares the TPU demo CLI's
output against these files; expected PSNR >= 55 dB with --fp32.

Usage (CPU, ~2 min at 1088p / ~10 min at 4K):
  JAX_PLATFORMS=cpu python scripts/make_demo_golden.py \
      --width 2560 --height 1088 \
      --ckpt /tmp/ref_rand_base.pt --prefix /tmp/v2560

Outputs: <ckpt> (created unless it exists), <prefix>_frame{0,1}.png,
<prefix>_golden_it.npy. Resolution must be %64 (demo pad protocol,
reference demo_2x.py:74 pads to /64 — generating at a /64 size keeps
the comparison pad-free).
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import torch
from PIL import Image

from refutil import import_reference

ASSET = "/root/reference/asset/example_frame{}.png"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=2560)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--variant", choices=("base", "lite"), default="base")
    ap.add_argument("--ckpt", default="/tmp/ref_rand_base.pt")
    ap.add_argument("--prefix", default="/tmp/vg")
    args = ap.parse_args()
    assert args.width % 64 == 0 and args.height % 64 == 0

    torch.set_num_threads(max(1, os.cpu_count() or 1))
    ref = import_reference()
    net_mod = (ref.network_base if args.variant == "base"
               else ref.network_lite)
    torch.manual_seed(7)
    model = net_mod.Network(global_motion=True)
    if os.path.exists(args.ckpt):
        sd = torch.load(args.ckpt, map_location="cpu", weights_only=True)
        model.load_state_dict(sd["model_state_dict"], strict=True)
        print(f"loaded {args.ckpt}")
    else:
        torch.save({"model_state_dict": model.state_dict()}, args.ckpt)
        print(f"saved fresh seed-7 init to {args.ckpt}")
    model.eval()

    frames = []
    for i in range(2):
        im = Image.open(ASSET.format(i)).convert("RGB").resize(
            (args.width, args.height), Image.BILINEAR)
        out = f"{args.prefix}_frame{i}.png"
        im.save(out)
        frames.append(np.asarray(im, np.uint8))
        print(f"wrote {out}")
    t0, t1 = (
        torch.from_numpy(f.astype(np.float32) / 255.0).permute(2, 0, 1)[None]
        for f in frames
    )
    with torch.no_grad():
        it = model(t0, t1)["I_t"]
    gpath = f"{args.prefix}_golden_it.npy"
    np.save(gpath, it[0].permute(1, 2, 0).numpy())
    print(f"wrote {gpath} {tuple(it.shape)}")


if __name__ == "__main__":
    main()
