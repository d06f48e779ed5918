"""Pose-consistency loss — optional, gated (reference loss_fn/pose_loss.py).

The reference's experimental PoseLoss depends on two external model
zoos (ultralytics YOLOv8 person detection + easy_ViTPose heatmaps) that
are commented out of its own requirements (requirements.txt:10-11) and
whose enabling flags are never initialized in the finetune trainer
(finetune_trainer.py:201-204 — a latent AttributeError, see
SURVEY.md §2.27). Here the same capability is exposed as a clean
pluggable interface: supply any detector/pose-estimator pair and get
the reference's masked-CE / KL heatmap losses; without one the loss is
disabled explicitly instead of crashing.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


class PoseLoss:
    """Heatmap-consistency loss between predicted and ground-truth frames.

    detector: (uint8 RGB image) -> [N, 4] person boxes (or None)
    pose_fn:  (cropped image batch) -> heatmaps [N, K, h, w]

    mode 'ce'  = masked cross-entropy (reference forward1, :150-175)
    mode 'kl'  = KL divergence        (reference forward2, :177-198)
    """

    def __init__(self, detector: Optional[Callable] = None,
                 pose_fn: Optional[Callable] = None, mode: str = "ce",
                 mask_threshold: float = 5e-4):
        self.detector = detector
        self.pose_fn = pose_fn
        self.mode = mode
        self.mask_threshold = mask_threshold

    @property
    def available(self) -> bool:
        return self.detector is not None and self.pose_fn is not None

    def heatmap_loss(self, pred_hm: jnp.ndarray, gt_hm: jnp.ndarray) -> jnp.ndarray:
        """Core loss on heatmaps [N, K, h, w] (both model outputs)."""
        gt_hm = jax.lax.stop_gradient(gt_hm)
        if self.mode == "kl":
            p = jax.nn.log_softmax(pred_hm.reshape(*pred_hm.shape[:2], -1), axis=-1)
            q = jax.nn.softmax(gt_hm.reshape(*gt_hm.shape[:2], -1), axis=-1)
            return jnp.mean(jnp.sum(q * (jnp.log(q + 1e-12) - p), axis=-1))
        # masked CE: only keypoints whose gt heatmap has confident peaks
        mask = (jnp.max(gt_hm, axis=(-2, -1)) > self.mask_threshold).astype(
            pred_hm.dtype
        )  # [N, K]
        log_p = jax.nn.log_softmax(pred_hm.reshape(*pred_hm.shape[:2], -1), axis=-1)
        q = jax.nn.softmax(gt_hm.reshape(*gt_hm.shape[:2], -1), axis=-1)
        ce = -jnp.sum(q * log_p, axis=-1)  # [N, K]
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        return jnp.sum(ce * mask) / denom

    def __call__(self, pred_img, gt_img) -> jnp.ndarray:
        if not self.available:
            return jnp.asarray(0.0)  # parity: returns 0 with no detection
        boxes = self.detector(gt_img)
        if boxes is None or len(boxes) == 0:
            return jnp.asarray(0.0)  # pose_loss.py:163-165
        pred_hm = self.pose_fn(pred_img, boxes)
        gt_hm = self.pose_fn(gt_img, boxes)
        return self.heatmap_loss(pred_hm, gt_hm)
