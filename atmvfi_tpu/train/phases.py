"""The 4-phase training recipe as declarative configs + freeze masks.

The reference switches phases by editing constants and calling
freeze/finetune dunders on the module tree (train.py:94-116,
finetune.py:91-114, network_base.py:262-334). Here each phase is a
dataclass and the freezes are optax `masked` trainability masks over
top-level param-tree prefixes — same partition of the model, purely
functional.

Module groups (top-level flax param keys):
  local  — encoder, cross-scale fusion, local ATMFormers + MLP,
           enhancement transformers, decoder pyramid, refiner
           (network_base.py:284-314)
  global — last_feat_extract, global fusion, global ATMFormers + MLP
           (network_base.py:272-282)
  refiner — the residual-refinement U-Net only (base variant's
           __finetune_refinenet_only__, network_base.py:316-334)
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax


def _is_global(name: str) -> bool:
    return name.startswith(
        ("last_feat_extract", "global_feature_fusion",
         "global_motion_atmformer", "global_motion_mlp")
    )


def _is_refiner(name: str) -> bool:
    return name.startswith(
        ("refine_proj", "down1", "down2", "down3", "up1", "up2", "up3",
         "refine_head")
    )


def _is_local(name: str) -> bool:
    return not _is_global(name)  # everything else belongs to the local path


def trainable_mask(params, train_local: bool, train_global: bool,
                   refiner_only: bool = False):
    """Boolean pytree: True where the parameter receives updates."""

    def decide(path_name: str) -> bool:
        if refiner_only:
            return _is_refiner(path_name)
        if _is_global(path_name):
            return train_global
        return train_local

    top = {name: decide(name) for name in params.keys()}
    return {
        name: jax.tree.map(lambda _: top[name], sub)
        for name, sub in params.items()
    }


@dataclasses.dataclass(frozen=True)
class PhaseConfig:
    name: str
    global_motion: bool
    train_local: bool
    train_global: bool
    refiner_only: bool = False
    # optimization (reference train.py:56-59, finetune.py:55-59)
    init_lr: float = 2e-4
    last_lr: float = 1e-4
    weight_decay: float = 1e-4
    num_epochs: int = 150
    batch_size: int = 24
    warmup_steps: int = 2000
    warmup_steps_resume: int = 400
    # loss switchboard (trainer.py:64-76, finetune_trainer.py:67-77)
    use_lap_loss: bool = True
    use_warping_loss: bool = True
    use_l1_loss: bool = False
    use_perceptual_loss: bool = False
    use_style_loss: bool = False
    use_bidirect_warp_loss: bool = False
    use_sobel_loss: bool = False
    use_pose_loss: bool = False
    lap_w: float = 1.0
    warping_w: float = 0.25
    l1_w: float = 1.0
    perceptual_w: float = 0.05
    style_w: float = 5e-9
    bidirect_w: float = 1.0
    sobel_w: float = 1.0
    pose_w: float = 1.0
    datasets: Tuple[str, ...] = ("vimeo90k",)


# Phase 1: local branch from scratch on Vimeo (train.py:110-112)
PHASE1 = PhaseConfig(
    name="phase1_local", global_motion=False,
    train_local=True, train_global=False,
)

# Phase 2: global branch pretrain, local frozen (train.py:113-116)
PHASE2 = PhaseConfig(
    name="phase2_global", global_motion=True,
    train_local=False, train_global=True,
    datasets=("vimeo90k", "x4k"),
)

# Phase 3: joint finetune, alternating Vimeo/X4K (finetune.py:105-138)
PHASE3 = PhaseConfig(
    name="phase3_joint", global_motion=True,
    train_local=True, train_global=True,
    init_lr=4e-5, last_lr=1e-5, num_epochs=300, batch_size=16,
    warmup_steps=500, warmup_steps_resume=50,
    datasets=("vimeo90k", "x4k"),
)

# Phase 4: perception finetune (adds VGG perceptual + style losses,
# finetune_trainer.py:67-77)
PHASE4 = PhaseConfig(
    name="phase4_perception", global_motion=True,
    train_local=True, train_global=True,
    init_lr=4e-5, last_lr=1e-5, num_epochs=300, batch_size=16,
    warmup_steps=500, warmup_steps_resume=50,
    use_perceptual_loss=True, use_style_loss=True,
    datasets=("vimeo90k", "x4k"),
)

PHASES = {p.name: p for p in (PHASE1, PHASE2, PHASE3, PHASE4)}


def get_phase(name: str) -> PhaseConfig:
    if name in PHASES:
        return PHASES[name]
    alias = {"1": PHASE1, "2": PHASE2, "3": PHASE3, "4": PHASE4}
    return alias[str(name)]
