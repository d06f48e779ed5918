"""Locate WHERE chained-kernel corruption lands in the output array.

Runs the broken conv101-pair chain at (768,104,1280) and reports, per
error threshold, the count of bad elements and the distinct bad
row-block (row//8), channel, and lane-tile (col//128, col//TW) indices.
All reductions on device; only small summaries cross the relay.
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from atmvfi_tpu.ops import conv_pallas as cp
from scripts.tpu_chain_probe import build


def main():
    print("backend:", jax.default_backend(), flush=True)
    BH, H, CT, W = 768, 768, 101, 1280

    def run(key):
        x, k1, b1, s1, k2, b2 = build(BH, H, CT, W, key)
        z = jnp.zeros_like(b2)
        y = cp.conv3x3_hcw_op(x, k1, b1, s1, H, True, False)
        y = cp.conv3x3_hcw_op(y, k2, b2, z, H, False, False)
        yx = cp._xla_equiv(x, k1, b1, s1, H, True)
        yx = cp._xla_equiv(yx, k2, b2, z, H, False)
        d = jnp.abs(y - yx)  # [BH, C, W]
        bad = d > 1e-4
        n_bad = jnp.sum(bad)
        # histograms over each axis
        row_hist = jnp.sum(bad, axis=(1, 2))          # [BH]
        ch_hist = jnp.sum(bad, axis=(0, 2))           # [C]
        col_hist = jnp.sum(bad, axis=(0, 1))          # [W]
        return n_bad, row_hist, ch_hist, col_hist, jnp.max(d)

    n_bad, row_hist, ch_hist, col_hist, mx = jax.jit(run)(
        jax.random.PRNGKey(3))
    import numpy as np
    rh = np.asarray(row_hist)
    chh = np.asarray(ch_hist)
    colh = np.asarray(col_hist)
    print(f"n_bad={int(n_bad)} max={float(mx):.3e}", flush=True)
    rows = np.nonzero(rh)[0]
    print("bad rows:", rows[:50].tolist(),
          "... total", len(rows), flush=True)
    print("bad rows %8:", sorted(set((rows % 8).tolist())), flush=True)
    print("bad rows //8 blocks:", sorted(set((rows // 8).tolist()))[:40],
          flush=True)
    chans = np.nonzero(chh)[0]
    print("bad channels:", chans[:60].tolist(), flush=True)
    cols = np.nonzero(colh)[0]
    print("bad cols:", cols[:60].tolist(), "... total", len(cols),
          flush=True)
    print("bad cols %128:", sorted(set((cols % 128).tolist()))[:40],
          flush=True)
    print("bad cols //256 (TW tiles):",
          sorted(set((cols // 256).tolist())), flush=True)


if __name__ == "__main__":
    main()
