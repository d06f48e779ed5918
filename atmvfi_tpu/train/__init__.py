"""Training subsystem: phases, schedules, trainer, checkpoints."""

from atmvfi_tpu.train.phases import (
    PHASE1,
    PHASE2,
    PHASE3,
    PHASE4,
    PHASES,
    PhaseConfig,
    get_phase,
    trainable_mask,
)
from atmvfi_tpu.train.schedule import cosine_with_linear_warmup
from atmvfi_tpu.train.trainer import Trainer, TrainerConfig, make_criterion

__all__ = [
    "PHASE1",
    "PHASE2",
    "PHASE3",
    "PHASE4",
    "PHASES",
    "PhaseConfig",
    "Trainer",
    "TrainerConfig",
    "cosine_with_linear_warmup",
    "get_phase",
    "make_criterion",
    "trainable_mask",
]
