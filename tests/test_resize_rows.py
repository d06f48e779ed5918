"""Row-banded traced-offset resize (ops/resize.py round 5c): the
spatial serving schedule computes only its slab's rows of the
progressive x2 global-flow upsample; must be bit-equal to slicing the
full chain (the align-corners coefficients use exact integer divmod —
a plain f32 product loses ~2e-5 at 4K row indices)."""
import numpy as np

import jax
import jax.numpy as jnp

from atmvfi_tpu.ops.resize import upsample_flow, upsample_flow_rows


def test_upsample_flow_rows_matches_full_chain():
    rng = np.random.default_rng(0)
    cases = [
        (40, 48, 3, 64, 64), (40, 48, 3, 0, 32), (40, 48, 3, 256, 64),
        (34, 60, 3, 120, 96), (68, 120, 2, 100, 44),
        (17, 30, 1, 10, 24), (272, 480, 3, 1856, 320),
    ]
    for h, w, levels, row0, out_len in cases:
        f = jnp.asarray(rng.standard_normal((1, h, w, 2)) * 20,
                        jnp.float32)
        full = f
        for _ in range(levels):
            full = upsample_flow(full, 2)
        ref = np.asarray(full[:, row0 : row0 + out_len])
        got = np.asarray(
            upsample_flow_rows(f, levels, jnp.int32(row0), out_len)
        )
        np.testing.assert_array_equal(got, ref, err_msg=str(
            (h, w, levels, row0, out_len)
        ))


def test_upsample_flow_rows_traced_offset():
    """row0 as a traced value under jit (the schedule's slab offsets)."""
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.standard_normal((1, 40, 32, 2)) * 10, jnp.float32)
    full = upsample_flow(upsample_flow(f, 2), 2)

    g = jax.jit(lambda flow, r: upsample_flow_rows(flow, 2, r, 48))
    for r0 in (0, 16, 112):
        # eager-vs-eager is bit-equal (see above); under jit XLA's FMA
        # contraction reorders the lerp arithmetic to ~1 ulp per level
        np.testing.assert_allclose(
            np.asarray(g(f, jnp.int32(r0))),
            np.asarray(full[:, r0 : r0 + 48]),
            atol=5e-5, rtol=5e-5,
        )
