"""Fast-serving-profile deviation: cfg.fast() vs exact, on the asset frames.

Measures PSNR between the exact serving output (bf16, checked warps,
two full-res resamplings) and the --fast profile (unchecked slab warps
+ composed full-res warps) for lite and base at 1088x1920. All
comparisons computed under jit on-device (eager relay comparisons are
unreliable) and read back as scalars.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_fast_quality.py [ckpt.pt|.npz]
"""
import sys

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from atmvfi_tpu.models import Network, get_config


def load_frames(h=1088, w=1920):
    fr = []
    for i in (0, 1):
        im = Image.open(
            f"/root/reference/asset/example_frame{i}.png"
        ).convert("RGB").resize((w, h), Image.BILINEAR)
        fr.append(jnp.asarray(np.asarray(im, np.float32) / 255.0)[None])
    return fr


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    im0, im1 = load_frames()
    ckpt = sys.argv[1] if len(sys.argv) > 1 else None
    for variant in ("lite", "base"):
        cfg = get_config(variant, dtype=jnp.bfloat16)
        net_exact = Network(cfg)
        net_fast = Network(cfg.fast())
        if ckpt:
            from atmvfi_tpu.convert import load_torch_checkpoint

            variables, _ = load_torch_checkpoint(ckpt)
        else:
            dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
            variables = jax.jit(
                lambda a, b: net_exact.init(jax.random.PRNGKey(0), a, b)
            )(dummy, dummy)

        @jax.jit
        def psnr_pair(v, a, b):
            e = jnp.clip(
                net_exact.apply(v, a, b, global_motion=True)["I_t"], 0, 1
            )
            f = jnp.clip(
                net_fast.apply(v, a, b, global_motion=True)["I_t"], 0, 1
            )
            mse = jnp.mean((e - f) ** 2)
            return -10.0 * jnp.log10(mse + 1e-12)

        val = float(psnr_pair(variables, im0, im1))
        print(f"{variant}: fast-vs-exact {val:.2f} dB "
              f"(deviation {10 ** (-val / 20):.2e} RMS)", flush=True)
        if ckpt:
            break  # ckpt matches one variant only


if __name__ == "__main__":
    main()
