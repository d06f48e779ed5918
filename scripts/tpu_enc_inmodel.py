"""In-model encoder-stage comparison with the real ckpt + frames (TPU).

Jits ONLY shared_feat_extraction with the demo's exact weights and
input, enc route on vs off (ATMVFI_HCW_DISABLE flips at trace time),
and diffs the outputs on device. Narrow repro of the 8 dB demo drop.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from atmvfi_tpu.infer.pipeline import load_pipeline
from atmvfi_tpu.utils.images import read_image


def main():
    print("backend:", jax.default_backend(), flush=True)
    pipe = load_pipeline("/tmp/ref_rand_base.pt", variant="base",
                         dtype=jnp.float32)
    net, variables = pipe.net, pipe.variables
    f0 = jnp.asarray(read_image("/tmp/vframe0.png"), jnp.float32)[None] / 255.0
    f1 = jnp.asarray(read_image("/tmp/vframe1.png"), jnp.float32)[None] / 255.0
    x = jnp.concatenate([f0, f1], axis=0)
    print("input", x.shape, flush=True)

    def run():
        f = jax.jit(lambda v, x: net.apply(
            v, x, method=lambda m, x: m.shared_feat_extraction(x)))
        return f(variables, x)

    os.environ["ATMVFI_HCW_DISABLE"] = ""
    on_out, on_feats = run()
    os.environ["ATMVFI_HCW_DISABLE"] = "enc,pair"
    off_out, off_feats = run()

    st = jax.jit(lambda a, b: (jnp.max(jnp.abs(a - b)),
                               jnp.mean(jnp.abs(a - b)),
                               jnp.max(jnp.abs(b))))
    mx, mn, ref = st(on_out, off_out)
    print(f"coarsest feat: max|d|={float(mx):.3e} mean={float(mn):.3e} "
          f"ref_max={float(ref):.3e}", flush=True)
    for i, (a, b) in enumerate(zip(on_feats, off_feats)):
        mx, mn, ref = st(a, b)
        print(f"feats[{i}] {tuple(a.shape)}: max|d|={float(mx):.3e} "
              f"mean={float(mn):.3e} ref_max={float(ref):.3e}", flush=True)


if __name__ == "__main__":
    main()
