"""LR schedule: cosine annealing with linear warmup dampening.

Reproduces the reference composition of CosineAnnealingLR +
pytorch_warmup.LinearWarmup (trainer.py:52-61, 345-349): the cosine
schedule advances every optimizer step and the warmup multiplies the
cosine LR by min(1, (t+1)/warmup_period).
"""
from __future__ import annotations

import jax.numpy as jnp


def cosine_with_linear_warmup(init_lr: float, last_lr: float, t_max: int,
                              warmup_steps: int):
    """Returns an optax-style schedule fn step -> lr."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        t = jnp.minimum(step, float(t_max))
        cosine = last_lr + (init_lr - last_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t / float(t_max))
        )
        damp = jnp.minimum(1.0, (step + 1.0) / float(max(warmup_steps, 1)))
        return cosine * damp

    return schedule
