"""Bisect which HCW route site diverges at model level on TPU.

Computes the conv_impl='xla' forward once as reference, then runs the
'auto' forward under each ATMVFI_HCW_DISABLE config (fresh jit per
config so the trace-time env read takes effect) and reports max|d| and
PSNR vs the reference. Includes an xla-vs-xla rerun as a determinism
control for the shared (warp/attention) kernels.

Usage: python scripts/tpu_route_bisect.py [base|lite] [H] [W]
"""
import dataclasses
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from atmvfi_tpu.models import Network, get_config


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "base"
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 1280
    cfg_a = get_config(name)
    cfg_x = dataclasses.replace(cfg_a, conv_impl="xla")
    print("backend:", jax.default_backend(), "model:", name, (H, W),
          flush=True)
    net_a, net_x = Network(cfg_a), Network(cfg_x)
    im_shape = (1, H, W, 3)
    variables = jax.jit(
        lambda k: net_x.init(k, jnp.zeros(im_shape, jnp.float32),
                             jnp.zeros(im_shape, jnp.float32))
    )(jax.random.PRNGKey(0))

    def make_fwd(net):
        def f(v, k):
            k0, k1 = jax.random.split(k)
            im0 = jax.random.uniform(k0, im_shape, jnp.float32)
            im1 = jnp.clip(
                im0 + 0.1 * jax.random.normal(k1, im_shape), 0.0, 1.0
            )
            return net.apply(v, im0, im1, global_motion=True)["I_t"]
        return jax.jit(f)

    key = jax.random.PRNGKey(7)
    ref = make_fwd(net_x)(variables, key)
    print("xla ref done", flush=True)

    cmp = jax.jit(lambda a, b: (
        jnp.max(jnp.abs(a - b)),
        10.0 * jnp.log10(1.0 / jnp.mean((a - b) ** 2)),
    ))

    # determinism control: fresh jit of the same xla graph
    ref2 = make_fwd(net_x)(variables, key)
    mx, ps = cmp(ref, ref2)
    print(f"CONTROL xla-vs-xla: max|d|={float(mx):.3e} "
          f"psnr={float(ps):.2f}", flush=True)

    ALL = ["enc", "dec", "pair", "proj", "up3", "head"]
    configs = [""]
    configs.append(",".join(ALL))
    for keep in ALL:
        configs.append(",".join(r for r in ALL if r != keep))
    for dis in configs:
        os.environ["ATMVFI_HCW_DISABLE"] = dis
        it = make_fwd(net_a)(variables, key)
        mx, ps = cmp(ref, it)
        on = [r for r in ALL if r not in dis.split(",")] or ["none"]
        print(f"on={'+'.join(on):28s} max|d|={float(mx):.3e} "
              f"psnr={float(ps):.2f}", flush=True)


if __name__ == "__main__":
    main()
