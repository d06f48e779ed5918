"""Dump aligned value slices of the in-model enc pair, kernels vs XLA.

The structure of 74%-magnitude divergence (shift / swap / scale /
epilogue) should be visible by eye in a few patches.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from atmvfi_tpu.models import Network, get_config


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = get_config("base", dtype=jnp.float32)
    net = Network(cfg)
    var = jax.jit(lambda k: net.init(
        k, jnp.zeros((1, 64, 128, 3), jnp.float32),
        jnp.zeros((1, 64, 128, 3), jnp.float32)))(jax.random.PRNGKey(1))

    x = jax.jit(lambda k: jax.random.uniform(
        k, (2, 1088, 2560, 3), jnp.float32))(jax.random.PRNGKey(0))

    def m(mod, x):
        return mod._conv_pair_hcw(mod.feat_extracts[0],
                                  mod.feat_extracts[1], x)

    def run(disable):
        os.environ["ATMVFI_HCW_DISABLE"] = disable
        return jax.jit(lambda v, x: net.apply(v, x, method=m))(var, x)

    on = run("")
    off = run("enc,pair")
    sl = jax.jit(lambda y: (
        y[0, 17, 200:208, :4],          # interior patch
        y[0, 0, 0:8, :4],               # top-left corner
        y[1, 1087, 2552:2560, :4],      # bottom-right of frame 2
        jnp.max(jnp.abs(on - off), axis=(0, 1, 2)),   # per-channel max
    ))
    pa, ca, ba, chmax = sl(on)
    pb, cb, bb, _ = sl(off)
    np.set_printoptions(precision=5, suppress=True, linewidth=120)
    print("per-channel max|d| (24):", np.asarray(chmax), flush=True)
    for tag, a, b in (("interior", pa, pb), ("corner", ca, cb),
                      ("bottom", ba, bb)):
        print(f"--- {tag} kernels:\n{np.asarray(a)}", flush=True)
        print(f"--- {tag} xla:\n{np.asarray(b)}", flush=True)


if __name__ == "__main__":
    main()
