"""Device route-matrix golden sweep (round-4 VERDICT item 7).

The HCW/planar route gates (ATMVFI_HCW_DISABLE sites x admission
predicates) form a parity surface that CI covers only in interpret
mode. This script runs the SAME demo-golden forward the verify flow
uses, once per route configuration — each Pallas site disabled in
turn, plus the fused-pair opt-in — and fails loudly if any
configuration shifts PSNR-vs-golden by more than 0.5 dB (the gate is
deliberately loose: bf16 route changes shift f32 summation order, see
the justification at the gate check in main below). This is the
standing defense for the weight-provenance Mosaic hazard
(pack_conv3x3_weights' `k + 0*sum(k)` guard): if a toolchain update
silently re-breaks a packed-weights site, the full-route row diverges
from the all-XLA rows here.

Fixtures (the verify-flow set): /tmp/ref_rand_base.pt +
/tmp/v2560_frame{0,1}.png + /tmp/v2560_golden_it.npy — generate with
  JAX_PLATFORMS=cpu python scripts/make_demo_golden.py \
      --width 2560 --height 1088 --ckpt /tmp/ref_rand_base.pt \
      --prefix /tmp/v2560

Run (exclusive; enables the persistent compile cache, so repeat runs
are fast): PYTHONPATH=/root/repo:/root/.axon_site \
    python -u scripts/tpu_route_matrix.py [--quick]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

SITES = [
    ("full", ""),                 # everything on (the shipping default)
    ("no-enc", "enc"),
    ("no-encp", "encp"),
    ("no-dec", "dec"),
    ("no-pair", "pair"),
    ("no-proj", "proj"),
    ("no-up2", "up2"),
    ("no-up3", "up3"),
    ("no-head", "head"),
    ("no-tail", "tail"),
    ("no-stackdx", None),         # ATMVFI_NO_STACKDX=1
    ("fuse-on", "+fuse"),         # cfg.hcw_fuse_pairs=True
    ("all-xla", "*"),             # conv/warp/attn xla, tail off
]
QUICK_SITES = {"full", "no-enc", "no-dec", "no-tail", "fuse-on",
               "all-xla"}


def main():
    import jax

    # persistent cache: the matrix is 13 jits of the same model family
    cache = "/root/repo/.jax_cache"
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    import jax.numpy as jnp
    from PIL import Image

    from atmvfi_tpu.convert import load_torch_checkpoint
    from atmvfi_tpu.models import Network, get_config

    for p in ("/tmp/ref_rand_base.pt", "/tmp/v2560_frame0.png",
              "/tmp/v2560_golden_it.npy"):
        assert os.path.exists(p), (
            f"missing fixture {p} — run scripts/make_demo_golden.py first"
        )
    print(f"device: {jax.devices()[0]}", flush=True)
    variables, _ = load_torch_checkpoint("/tmp/ref_rand_base.pt")
    f0 = np.asarray(Image.open("/tmp/v2560_frame0.png"), np.float32) / 255
    f1 = np.asarray(Image.open("/tmp/v2560_frame1.png"), np.float32) / 255
    golden = np.load("/tmp/v2560_golden_it.npy")
    if golden.ndim == 4:
        golden = golden[0]
    if golden.shape[0] == 3:
        golden = golden.transpose(1, 2, 0)
    x0 = jnp.asarray(f0)[None]
    x1 = jnp.asarray(f1)[None]

    quick = "--quick" in sys.argv
    results = {}
    for name, site in SITES:
        if quick and name not in QUICK_SITES:
            continue
        os.environ.pop("ATMVFI_HCW_DISABLE", None)
        os.environ.pop("ATMVFI_NO_STACKDX", None)
        cfg = get_config("base", dtype=jnp.float32)
        if site == "*":
            cfg = dataclasses.replace(
                cfg, conv_impl="xla", warp_impl="xla",
                attention_impl="xla", tail_planar="off",
            )
        elif site == "+fuse":
            cfg = dataclasses.replace(cfg, hcw_fuse_pairs=True)
        elif site is None:
            os.environ["ATMVFI_NO_STACKDX"] = "1"
        elif site:
            os.environ["ATMVFI_HCW_DISABLE"] = site
        net = Network(cfg)
        t0 = time.time()
        out = jax.jit(
            lambda v, a, b: net.apply(v, a, b, global_motion=True)["I_t"]
        )(variables, x0, x1)
        out = np.asarray(jnp.clip(out, 0, 1), np.float32)[0]
        mse = float(np.mean((out - golden) ** 2))
        psnr = -10 * np.log10(mse) if mse > 0 else np.inf
        results[name] = psnr
        print(f"{name:12s}: {psnr:7.2f} dB vs golden "
              f"({time.time()-t0:.0f}s)", flush=True)

    os.environ.pop("ATMVFI_HCW_DISABLE", None)
    os.environ.pop("ATMVFI_NO_STACKDX", None)
    base = results["full"]
    # Gate: 0.5 dB. At the ~73 dB working point, exact-but-different
    # route compositions differ by up to ~0.2 dB from f32 summation
    # order alone (measured: no-encp 72.64 vs full 72.81); the failure
    # mode this guards — a silent wrong-answer kernel route, e.g. the
    # round-2 provenance bug — measured an 8 dB drop.
    bad = {k: v for k, v in results.items() if abs(v - base) > 0.5}
    print(f"\nroute matrix: full={base:.2f} dB, spread "
          f"{max(results.values()) - min(results.values()):.3f} dB",
          flush=True)
    assert not bad, f"routes shifted >0.5 dB vs full: {bad}"
    print("route matrix OK (all configurations within 0.5 dB)",
          flush=True)


if __name__ == "__main__":
    main()
