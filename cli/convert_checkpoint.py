"""Convert a reference PyTorch checkpoint to a native .npz.

  python cli/convert_checkpoint.py in.pt out.npz [--variant base]

Verifies the converted tree matches the target model's parameter
structure before writing.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--variant", choices=["base", "lite"], default="base")
    p.add_argument("--no_verify", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from atmvfi_tpu.convert import load_torch_checkpoint
    from atmvfi_tpu.models import Network, get_config
    from atmvfi_tpu.train.checkpoints import save_params_npz

    variables, meta = load_torch_checkpoint(args.src)

    if not args.no_verify:
        net = Network(get_config(args.variant))
        im = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
        want = jax.eval_shape(
            lambda a, b: net.init(jax.random.PRNGKey(0), a, b), im, im
        )
        from flax.traverse_util import flatten_dict

        got_keys = set(flatten_dict(variables).keys())
        want_keys = set(flatten_dict(want).keys())
        missing = want_keys - got_keys
        extra = got_keys - want_keys
        if missing or extra:
            raise SystemExit(
                f"structure mismatch: missing {sorted(missing)[:5]} "
                f"extra {sorted(extra)[:5]}"
            )
        for k in want_keys:
            w = flatten_dict(want)[k].shape
            g = flatten_dict(variables)[k].shape
            if tuple(w) != tuple(g):
                raise SystemExit(f"shape mismatch at {k}: {g} vs {w}")
        print(f"verified {len(want_keys)} parameters against {args.variant}")

    meta_small = {
        k: v for k, v in meta.items() if isinstance(v, (str, int, float, dict))
    }
    save_params_npz(args.dst, variables, meta=meta_small or None)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
