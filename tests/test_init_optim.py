"""Init-statistics and optimizer parity (training-from-scratch math)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax


@pytest.fixture(scope="module")
def lite_params():
    from atmvfi_tpu.models import Network, get_config

    net = Network(get_config("lite"))
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(
        lambda a, b: net.init(jax.random.PRNGKey(0), a, b)
    )(dummy, dummy)
    return variables["params"]


def test_init_statistics_match_reference_scheme(lite_params):
    p = lite_params
    # encoder conv: torch default U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    k = np.asarray(p["feat_extracts_0"]["conv"]["kernel"])  # (3,3,3,16)
    bound = 1.0 / np.sqrt(3 * 3 * 3)
    assert np.abs(k).max() <= bound + 1e-6
    assert np.abs(k).std() > bound / 4  # actually uniform, not collapsed
    # PReLU slopes init 0.25
    assert np.allclose(np.asarray(p["feat_extracts_0"]["prelu"]), 0.25)
    # attention linear: trunc_normal(std=.02), clipped at 2 sigma
    q = np.asarray(p["local_motion_atmformer_0"]["attn"]["q"]["kernel"])
    assert abs(q.std() - 0.02) < 0.005
    assert np.abs(q).max() <= 0.04 + 1e-6
    # LayerNorm: scale 1, bias 0
    assert np.allclose(
        np.asarray(p["local_motion_atmformer_0"]["norm1"]["scale"]), 1.0
    )
    # MSRA conv in fusion block: normal(0, sqrt(2/fan_out))
    ck = np.asarray(p["cross_scale_feature_fusion"]["layers_0"]["kernel"])
    fan_out = 9 * ck.shape[-1]
    assert abs(ck.std() - np.sqrt(2.0 / fan_out)) < 0.2 * np.sqrt(2.0 / fan_out)


def test_adamw_step_matches_torch():
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((6, 5)).astype(np.float32)
    g = rng.standard_normal((6, 5)).astype(np.float32)
    lr, wd = 2e-4, 1e-4

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.AdamW([tw], lr=lr, weight_decay=wd, betas=(0.9, 0.999))
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()
    want = tw.detach().numpy()

    tx = optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=wd)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
    got = np.asarray(params)
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)
