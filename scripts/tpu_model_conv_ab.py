"""On-TPU model-level conv-route A/B: conv_impl='auto' vs 'xla'.

Same params, same input, both forwards on TPU under jit; reports
max|I_t diff| and PSNR between the two routes. Usage:
    python scripts/tpu_model_conv_ab.py [base|lite] [H] [W]
"""
import dataclasses
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from atmvfi_tpu.models import Network, get_config


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "base"
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 1280
    cfg_a = get_config(name)            # auto -> HCW kernels on TPU
    cfg_x = dataclasses.replace(cfg_a, conv_impl="xla")
    print("backend:", jax.default_backend(), "model:", name, (H, W),
          flush=True)

    net_a, net_x = Network(cfg_a), Network(cfg_x)
    key = jax.random.PRNGKey(0)
    im_shape = (1, H, W, 3)
    variables = jax.eval_shape(
        lambda k: net_x.init(k, jnp.zeros(im_shape, jnp.float32),
                             jnp.zeros(im_shape, jnp.float32)), key)
    # real init on device (cheap at these sizes through jit)
    variables = jax.jit(
        lambda k: net_x.init(k, jnp.zeros(im_shape, jnp.float32),
                             jnp.zeros(im_shape, jnp.float32))
    )(key)

    def fwd(net):
        def f(v, k):
            k0, k1 = jax.random.split(k)
            im0 = jax.random.uniform(k0, im_shape, jnp.float32)
            im1 = jnp.clip(
                im0 + 0.1 * jax.random.normal(k1, im_shape), 0.0, 1.0
            )
            out = net.apply(v, im0, im1, global_motion=True)
            return out["I_t"]
        return jax.jit(f)

    it_a = fwd(net_a)(variables, jax.random.PRNGKey(7))
    print("auto route done", flush=True)
    it_x = fwd(net_x)(variables, jax.random.PRNGKey(7))
    d = jax.jit(
        lambda a, b: (
            jnp.max(jnp.abs(a - b)),
            10.0 * jnp.log10(1.0 / jnp.mean((a - b) ** 2)),
        )
    )(it_a, it_x)
    print(f"max|d|={float(d[0]):.3e}  psnr_between={float(d[1]):.2f} dB",
          flush=True)


if __name__ == "__main__":
    main()
