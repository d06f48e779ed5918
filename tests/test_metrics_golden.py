"""Golden tests: PSNR/SSIM metrics vs the reference torch implementations."""
import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from atmvfi_tpu.evalkit import metrics


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_ssim():
    return _load_ref("ref_msssim", "/root/reference/benchmark/pytorch_msssim.py")


def _pair(seed, shape=(1, 33, 47, 3)):
    rng = np.random.default_rng(seed)
    base = rng.random(shape, dtype=np.float32)
    noisy = np.clip(base + rng.normal(0, 0.05, shape).astype(np.float32), 0, 1)
    return base, noisy


def _t(x):
    return torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()


def test_ssim_matlab_matches(ref_ssim):
    a, b = _pair(0)
    want = ref_ssim.ssim_matlab(_t(a), _t(b)).item()
    got = float(metrics.ssim_matlab(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 2e-6


def test_ssim_2d_matches(ref_ssim):
    a, b = _pair(1)
    want = ref_ssim.ssim(_t(a), _t(b)).item()
    got = float(metrics.ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 2e-6


def test_msssim_matches(ref_ssim):
    a, b = _pair(2, shape=(1, 180, 220, 3))
    want = ref_ssim.msssim(_t(a), _t(b)).item()
    got = float(metrics.msssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 5e-5


def test_psnr_matches_formula():
    a, b = _pair(3)
    want = -10 * np.log10(((a - b) ** 2).mean())
    got = float(metrics.psnr(jnp.asarray(b), jnp.asarray(a)))
    assert abs(got - want) < 1e-4


def test_ie():
    a, b = _pair(4)
    want = np.abs(np.round(a * 255) - np.round(b * 255)).mean()
    got = float(metrics.ie(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-4
