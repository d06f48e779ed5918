"""Drill the in-model encoder-pair divergence down to its ingredient.

Narrow function: net.apply(m._conv_pair_hcw(fe[0], fe[1], x)) with the
enc kernels on vs off (pure XLA), diffed on device. Ingredients:
  i1 real ckpt weights + real frames   (expect: reproduces, ~1e-1)
  i2 real ckpt weights + random frames
  i3 random-init weights + real frames
Run order gives which ingredient triggers it.
"""
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from atmvfi_tpu.infer.pipeline import load_pipeline
from atmvfi_tpu.models import Network, get_config
from atmvfi_tpu.utils.images import read_image


def pair_out(net, variables, x, disable):
    os.environ["ATMVFI_HCW_DISABLE"] = disable

    def m(mod, x):
        return mod._conv_pair_hcw(mod.feat_extracts[0],
                                  mod.feat_extracts[1], x)

    return jax.jit(lambda v, x: net.apply(v, x, method=m))(variables, x)


def compare(tag, net, variables, x):
    on = pair_out(net, variables, x, "")
    off = pair_out(net, variables, x, "enc,pair")
    st = jax.jit(lambda a, b: (jnp.max(jnp.abs(a - b)),
                               jnp.mean(jnp.abs(a - b)),
                               jnp.max(jnp.abs(b))))
    mx, mn, ref = st(on, off)
    print(f"{tag}: max|d|={float(mx):.3e} mean={float(mn):.3e} "
          f"ref_max={float(ref):.3e}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    pipe = load_pipeline("/tmp/ref_rand_base.pt", variant="base",
                         dtype=jnp.float32)
    net, variables = pipe.net, pipe.variables
    f0 = jnp.asarray(read_image("/tmp/vframe0.png"), jnp.float32)[None] / 255.0
    f1 = jnp.asarray(read_image("/tmp/vframe1.png"), jnp.float32)[None] / 255.0
    x_real = jnp.concatenate([f0, f1], axis=0)

    compare("i1 real-w real-x  ", net, variables, x_real)

    x_rand = jax.jit(lambda k: jax.random.uniform(
        k, x_real.shape, jnp.float32))(jax.random.PRNGKey(0))
    compare("i2 real-w rand-x  ", net, variables, x_rand)

    cfg = get_config("base", dtype=jnp.float32)
    net_r = Network(cfg)
    var_r = jax.jit(lambda k: net_r.init(
        k, jnp.zeros((1, 64, 128, 3), jnp.float32),
        jnp.zeros((1, 64, 128, 3), jnp.float32)))(jax.random.PRNGKey(1))
    compare("i3 rand-w real-x  ", net_r, var_r, x_real)


if __name__ == "__main__":
    main()
