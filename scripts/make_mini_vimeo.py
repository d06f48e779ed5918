"""Generate the mini-Vimeo parity fixture (round-5 VERDICT item 5).

Writes tests/fixtures/mini_vimeo/{tri_testlist.txt, sequences/NNNNN/
im{1,2,3}.png}: 10 triplets at the Vimeo90K protocol resolution
(448x256, /root/reference/benchmark/test_vimeo90k.py — no padding
needed) derived deterministically from the reference asset frames by
sliding 448x256 crops along a motion vector (im1 at -d, im2 at 0,
im3 at +d) with a light brightness ramp, so the model sees real
translational motion and PSNR lands in the realistic 20-35 dB band.

The parity test (tests/test_mini_vimeo_parity.py) runs BOTH the torch
reference model and this repo's pipeline over these triplets with
identical (seeded random-init) weights and gates the mean PSNR delta —
an end-to-end protocol loop for the "within 0.05 dB" north star that
needs no dataset download.

Run: JAX_PLATFORMS=cpu python scripts/make_mini_vimeo.py
"""
import os

import numpy as np
from PIL import Image

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "mini_vimeo")
W, H = 448, 256


def main():
    # the asset frames are 414x600 — upscale to a 960x600 canvas so
    # 448x256 crops with +-12 px motion headroom exist
    f0 = np.asarray(
        Image.open("/root/reference/asset/example_frame0.png")
        .convert("RGB").resize((960, 600), Image.BILINEAR)
    )
    f1 = np.asarray(
        Image.open("/root/reference/asset/example_frame1.png")
        .convert("RGB").resize((960, 600), Image.BILINEAR)
    )
    ih, iw = f0.shape[:2]
    rng = np.random.default_rng(20260820)
    seq_dir = os.path.join(OUT, "sequences")
    os.makedirs(seq_dir, exist_ok=True)
    names = []
    for k in range(10):
        src = f0 if k % 2 == 0 else f1
        # crop center + per-triplet motion vector (pixels per half-step)
        cx = int(rng.integers(20, iw - W - 20))
        cy = int(rng.integers(12, ih - H - 12))
        dx = int(rng.integers(-12, 13))
        dy = int(rng.integers(-6, 7))
        dx, dy = (dx or 5), (dy or 3)
        gain = 1.0 + 0.03 * float(rng.standard_normal())

        def crop(t):  # t in {-1, 0, 1}
            x = np.clip(cx + t * dx, 0, iw - W)
            y = np.clip(cy + t * dy, 0, ih - H)
            img = src[y : y + H, x : x + W].astype(np.float32)
            img = img * (gain ** t)
            return np.clip(np.round(img), 0, 255).astype(np.uint8)

        name = f"{k:05d}/0001"
        d = os.path.join(seq_dir, name)
        os.makedirs(d, exist_ok=True)
        for i, t in enumerate((-1, 0, 1)):
            Image.fromarray(crop(t)).save(os.path.join(d, f"im{i+1}.png"))
        names.append(name)
    with open(os.path.join(OUT, "tri_testlist.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    print(f"wrote {len(names)} triplets to {OUT}")


if __name__ == "__main__":
    main()
