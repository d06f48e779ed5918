"""Shared utilities: meters, image/flow IO, flow viz, seeding."""

import random

import numpy as np

from atmvfi_tpu.utils.meters import AverageMeter, AverageMeterGroups


def seed_all(seed: int) -> None:
    """Seed python + numpy RNGs (reference benchmark/utils.py:94-99).

    JAX randomness is explicit (jax.random.PRNGKey), so there is no
    global JAX state to seed; pass PRNGKey(seed) where needed.
    """
    random.seed(seed)
    np.random.seed(seed)


__all__ = ["AverageMeter", "AverageMeterGroups", "seed_all"]
