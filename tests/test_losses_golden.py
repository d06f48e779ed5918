"""Golden tests: losses vs the torch reference implementations."""
import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from atmvfi_tpu import losses


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_lap():
    return _load_ref("ref_lap", "/root/reference/loss_fn/laplacian_pyramid_loss.py")


@pytest.fixture(scope="module")
def ref_census():
    return _load_ref("ref_census", "/root/reference/loss_fn/census_loss.py")


@pytest.fixture(scope="module")
def ref_sobel():
    return _load_ref("ref_sobel", "/root/reference/loss_fn/edge_loss.py")


def _pair(seed, shape=(2, 32, 48, 3)):
    rng = np.random.default_rng(seed)
    a = rng.random(shape, dtype=np.float32)
    b = rng.random(shape, dtype=np.float32)
    return a, b


def _t(x):
    return torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()


@pytest.mark.parametrize("levels", [2, 5])
def test_lap_loss_matches(ref_lap, levels):
    a, b = _pair(0, shape=(2, 64, 96, 3))
    crit = ref_lap.LapLoss(max_levels=levels)
    want = crit(_t(a), _t(b)).item()
    got = float(losses.lap_loss(jnp.asarray(a), jnp.asarray(b), max_levels=levels))
    assert abs(got - want) < 1e-5


def test_census_loss_matches(ref_census):
    a, b = _pair(1)
    crit = ref_census.Ternary(device=torch.device("cpu"))
    want = crit(_t(a), _t(b)).item()
    got = float(losses.census_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-5


def test_sobel_loss_matches(ref_sobel):
    import jax

    a, b = _pair(2)
    crit = ref_sobel.SobelLoss()
    want = crit(_t(a), _t(b)).item()
    with jax.default_matmul_precision("highest"):
        got = float(losses.sobel_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-5


def test_charbonnier_matches():
    a, b = _pair(3)
    want = torch.mean(torch.sqrt((_t(a) - _t(b)).pow(2) + 1e-6)).item()
    got = float(losses.charbonnier_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-6


def test_pose_loss_disabled_returns_zero():
    loss = losses.PoseLoss()
    assert not loss.available
    a, b = _pair(4)
    assert float(loss(a, b)) == 0.0
