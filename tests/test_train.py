"""Trainer + parallelism tests on the 8-device virtual CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from atmvfi_tpu.train import (
    PHASE1,
    PHASE2,
    Trainer,
    TrainerConfig,
    cosine_with_linear_warmup,
    get_phase,
    trainable_mask,
)


def test_schedule_matches_torch_composition():
    """Cosine+warmup vs torch CosineAnnealingLR * LinearWarmup factors."""
    init_lr, last_lr, t_max, warmup = 2e-4, 1e-4, 1000, 100
    sched = cosine_with_linear_warmup(init_lr, last_lr, t_max, warmup)
    for step in [0, 10, 99, 100, 500, 999, 1000]:
        cos = last_lr + (init_lr - last_lr) * 0.5 * (
            1 + np.cos(np.pi * min(step, t_max) / t_max)
        )
        damp = min(1.0, (step + 1) / warmup)
        assert abs(float(sched(step)) - cos * damp) < 1e-10


def test_trainable_mask_partitions():
    from atmvfi_tpu.models import Network, get_config

    net = Network(get_config("lite"))
    im = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    params = jax.eval_shape(
        lambda a, b: net.init(jax.random.PRNGKey(0), a, b), im, im
    )["params"]

    def count(mask):
        flat = jax.tree.leaves(
            jax.tree.map(lambda m, p: int(m) * p.size, mask, params)
        )
        return sum(flat)

    total = sum(p.size for p in jax.tree.leaves(params))
    m_all = trainable_mask(params, True, True)
    m_local = trainable_mask(params, True, False)
    m_global = trainable_mask(params, False, True)
    m_ref = trainable_mask(params, False, False, refiner_only=True)
    assert count(m_all) == total
    assert count(m_local) + count(m_global) == total
    assert 0 < count(m_ref) < count(m_local)


def test_phase_configs():
    assert get_phase("1").global_motion is False
    assert get_phase("2").train_local is False
    assert get_phase("4").use_perceptual_loss
    assert get_phase("3").init_lr == 4e-5


@pytest.fixture(scope="module")
def tiny_batch():
    rng = np.random.default_rng(0)
    return [rng.random((2, 64, 64, 3), dtype=np.float32) for _ in range(3)]


def test_train_step_single_device(tiny_batch):
    trainer = Trainer(
        TrainerConfig(phase=PHASE1, variant="lite", steps_per_epoch=10,
                      num_epochs=1)
    )
    im0, gt, im1 = (jnp.asarray(x) for x in tiny_batch)
    state0 = trainer.state
    p_before = jax.device_get(state0.params)
    state1, metrics = trainer._train_step(state0, im0, gt, im1)
    assert np.isfinite(float(metrics["loss"]))
    assert "lap_loss" in metrics and "warping_loss" in metrics
    # params must actually move
    p_after = jax.device_get(state1.params)
    moved = jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()), p_before, p_after
    )
    assert max(jax.tree.leaves(moved)) > 0


def test_frozen_params_do_not_move(tiny_batch):
    """Phase 2 freezes the local branch; its params must stay fixed."""
    trainer = Trainer(
        TrainerConfig(phase=PHASE2, variant="lite", steps_per_epoch=10,
                      num_epochs=1)
    )
    im0, gt, im1 = (jnp.asarray(x) for x in tiny_batch)
    p_before = jax.device_get(trainer.state.params)
    state1, _ = trainer._train_step(trainer.state, im0, gt, im1)
    p_after = jax.device_get(state1.params)
    # a local-branch module must be untouched; a global one must move
    local_diff = np.abs(
        p_before["feat_extracts_0"]["conv"]["kernel"]
        - p_after["feat_extracts_0"]["conv"]["kernel"]
    ).max()
    global_diff = np.abs(
        p_before["global_motion_mlp_0"]["conv"]["kernel"]
        - p_after["global_motion_mlp_0"]["conv"]["kernel"]
    ).max()
    assert local_diff == 0.0
    assert global_diff > 0.0


def test_dryrun_multichip_8dev():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    # check 1 only: checks 2/3 (1080p sharded forward, bs16@448 train
    # step) compile for tens of minutes on the CPU mesh — the driver's
    # dryrun runs them (MULTICHIP_r02), not CI
    ge.dryrun_multichip(8, checks=(1,))
