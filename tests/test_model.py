"""Model structure + full-forward parity tests (lite variant, CPU)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from atmvfi_tpu.convert import convert_state_dict, map_torch_key
from atmvfi_tpu.models import Network, get_config


def _param_count(variant):
    net = Network(get_config(variant))
    im = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    tree = jax.eval_shape(
        lambda a, b: net.init(jax.random.PRNGKey(0), a, b), im, im
    )
    return sum(x.size for x in jax.tree.leaves(tree))


def test_param_counts_match_reference():
    # README.md:69-70 — 51.56M base, 11.98M lite
    assert round(_param_count("base") / 1e6, 2) == 51.56
    assert round(_param_count("lite") / 1e6, 2) == 11.98


@pytest.fixture(scope="module")
def lite_pair():
    from refutil import import_reference

    ref = import_reference()
    torch.manual_seed(0)
    tmodel = ref.network_lite.Network(global_motion=True)
    tmodel.eval()
    variables = convert_state_dict(tmodel.state_dict())
    net = Network(get_config("lite"))
    return tmodel, net, variables


def test_converter_maps_every_key(lite_pair):
    tmodel, _, _ = lite_pair
    unmapped = [
        k for k in tmodel.state_dict()
        if not k.endswith(("relative_coord", "attn_mask", "HW"))
        and map_torch_key(k) is None
    ]
    assert unmapped == []


def test_converter_shapes_match_model(lite_pair):
    _, net, variables = lite_pair
    from flax.traverse_util import flatten_dict

    im = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    want = jax.eval_shape(
        lambda a, b: net.init(jax.random.PRNGKey(0), a, b), im, im
    )
    fw = flatten_dict(want)
    fg = flatten_dict(variables)
    assert set(fw) == set(fg)
    for k in fw:
        assert tuple(fw[k].shape) == tuple(fg[k].shape), k


@pytest.mark.parametrize("global_motion", [False, True])
def test_full_forward_parity(lite_pair, global_motion):
    tmodel, net, variables = lite_pair
    rng = np.random.default_rng(7)
    im0 = rng.random((1, 64, 96, 3), dtype=np.float32)
    im1 = rng.random((1, 64, 96, 3), dtype=np.float32)
    tmodel.global_motion = global_motion
    with torch.no_grad():
        tres = tmodel(
            torch.from_numpy(im0).permute(0, 3, 1, 2),
            torch.from_numpy(im1).permute(0, 3, 1, 2),
        )
    fwd = jax.jit(net.apply, static_argnames=("global_motion",))
    with jax.default_matmul_precision("highest"):
        jres = fwd(variables, jnp.asarray(im0), jnp.asarray(im1),
                   global_motion=global_motion)
    want = tres["I_t"].permute(0, 2, 3, 1).numpy()
    got = np.asarray(jres["I_t"])
    assert np.abs(got - want).max() < 5e-4
    # flows too (pre-clip path)
    wantf = tres["opt_flow_0"].permute(0, 2, 3, 1).numpy()
    gotf = np.asarray(jres["opt_flow_0"])
    assert np.abs(gotf - wantf).max() < 5e-4


def test_output_dict_keys(lite_pair):
    _, net, variables = lite_pair
    rng = np.random.default_rng(8)
    im = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    out = jax.jit(net.apply)(variables, im, im)
    expected = {
        "I_t", "im_t_list", "im0_warped_list", "im1_warped_list",
        "opt_flow_0", "opt_flow_1", "I_t_0", "I_t_1", "occ_mask1", "occ_mask2",
    }
    assert expected == set(out.keys())
    # global on: 1/16 + 1/8 + 3 decoder scales = 5 entries, fine->coarse
    assert len(out["im_t_list"]) == 5
    assert out["im_t_list"][0].shape == (1, 64, 64, 3)
