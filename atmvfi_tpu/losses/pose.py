"""Pose-consistency loss — optional, gated (reference loss_fn/pose_loss.py).

The reference's experimental PoseLoss depends on two external model
zoos (ultralytics YOLOv8 person detection + easy_ViTPose heatmaps) that
are commented out of its own requirements (requirements.txt:10-11) and
whose enabling flags are never initialized in the finetune trainer
(finetune_trainer.py:201-204 — a latent AttributeError, see
SURVEY.md §2.27). Here the same capability is exposed as a clean
pluggable interface — supply any detector/pose-estimator pair — while
the surrounding math is ported exactly:

  * box filtering/padding  (process_bboxes,   pose_loss.py:92-111)
  * crop -> aspect-pad -> resize -> normalize (get_cropped_img +
    pad_image,                                 pose_loss.py:52-133)
  * masked per-pixel CE over the 17 keypoint channels
    (forward1 + get_mask,                      pose_loss.py:150-175,203-225)
  * channelwise-KL                             (forward2, pose_loss.py:177-198)

Heatmaps are [N, K, h, w] (channel-first like the reference's ViTPose
output). Without a detector/pose_fn the loss is disabled explicitly
instead of crashing.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from atmvfi_tpu.ops.resize import resize_bilinear

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def process_boxes(raw: np.ndarray, H: int, W: int,
                  conf_thresh: float = 0.35, pad: int = 10) -> np.ndarray:
    """Filter + pad person boxes (pose_loss.py:92-111).

    raw: [N, 6] float (xmin, ymin, xmax, ymax, conf, cls). Keeps
    conf >= thresh AND cls == 0, rounds to int, expands by `pad` px
    (the reference's pad_bbox buffer (-10, 10)), clamps to the image.
    """
    raw = np.asarray(raw, np.float32).reshape(-1, 6)
    keep = (raw[:, 4] >= conf_thresh) & (raw[:, 5] == 0)
    b = np.round(raw[keep]).astype(np.int64)
    b[:, [0, 2]] = np.clip(b[:, [0, 2]] + np.array([-pad, pad]), 0, W)
    b[:, [1, 3]] = np.clip(b[:, [1, 3]] + np.array([-pad, pad]), 0, H)
    return b


def _pad_to_aspect(crop: np.ndarray, aspect: float = 3.0 / 4.0):
    """Zero-pad [h, w, 3] to width/height == aspect (pad_image, :52-82)."""
    h, w = crop.shape[:2]
    if w / h < aspect:
        target_w = int(aspect * h)
        pw = target_w - w
        left = pw // 2
        return np.pad(crop, ((0, 0), (left, pw - left), (0, 0))), (left, 0)
    target_h = int(w / aspect)
    ph = target_h - h
    top = ph // 2
    return np.pad(crop, ((top, ph - top), (0, 0), (0, 0))), (0, top)


def prepare_crops(img: np.ndarray, boxes_per_sample: Sequence[np.ndarray],
                  resize_hw=(256, 192), max_batch: int = 64) -> Optional[jnp.ndarray]:
    """ImageNet-normalize, crop boxes, pad to 3:4, resize 256x192.

    img: [B, H, W, 3] float in [0, 1] (NHWC; reference works NCHW).
    boxes_per_sample: per-batch-sample [N_b, >=4] int boxes.
    Returns [M, 256, 192, 3] (M capped at max_batch) or None when no
    boxes survive — the caller returns loss 0 (pose_loss.py:163-165).
    Matches get_cropped_img (:113-133): normalize FIRST, then crop.
    """
    img = (np.asarray(img, np.float32) - _IMAGENET_MEAN) / _IMAGENET_STD
    crops: List[np.ndarray] = []
    for b, boxes in enumerate(boxes_per_sample):
        for box in np.asarray(boxes).reshape(-1, boxes.shape[-1] if len(boxes) else 4):
            x0, y0, x1, y1 = (int(v) for v in box[:4])
            if x1 <= x0 or y1 <= y0:
                continue
            crop = img[b, y0:y1, x0:x1]
            padded, _ = _pad_to_aspect(crop)
            resized = resize_bilinear(
                jnp.asarray(padded)[None], *resize_hw
            )[0]
            crops.append(np.asarray(resized))
    crops = crops[:max_batch]
    if not crops:
        return None
    return jnp.asarray(np.stack(crops))


def pose_mask(gt_hm: jnp.ndarray, threshold: float = 0.9,
              kp_threshold: float = 1.2) -> jnp.ndarray:
    """Per-pixel validity mask (get_mask, pose_loss.py:203-225).

    gt_hm: [N, K, h, w]. A keypoint class is valid when its spatial max
    exceeds kp_threshold; a pixel is kept when its argmax class is
    valid AND its max logit reaches threshold * that class's max.
    """
    mx = jnp.max(gt_hm, axis=1)                       # [N, h, w]
    cls = jnp.argmax(gt_hm, axis=1)                   # [N, h, w]
    a = jnp.max(gt_hm, axis=(2, 3))                   # [N, K] per-class max
    valid = a > kp_threshold                          # [N, K]
    N, h, w = mx.shape
    flat_cls = cls.reshape(N, h * w)
    a_pix = jnp.take_along_axis(a, flat_cls, axis=1).reshape(N, h, w)
    v_pix = jnp.take_along_axis(valid, flat_cls, axis=1).reshape(N, h, w)
    return (v_pix & (mx >= threshold * a_pix)).astype(gt_hm.dtype)


def heatmap_ce_loss(pred_hm: jnp.ndarray, gt_hm: jnp.ndarray) -> jnp.ndarray:
    """forward1 (pose_loss.py:150-175): per-pixel CE over the K keypoint
    channels against the gt argmax label, masked, MEAN over all pixels
    (torch.mean(loss * mask) divides by the full element count)."""
    gt_hm = jax.lax.stop_gradient(gt_hm)
    label = jnp.argmax(gt_hm, axis=1)                  # [N, h, w]
    log_p = jax.nn.log_softmax(pred_hm, axis=1)        # [N, K, h, w]
    ce = -jnp.take_along_axis(log_p, label[:, None], axis=1)[:, 0]
    return jnp.mean(ce * pose_mask(gt_hm))


def heatmap_kl_loss(pred_hm: jnp.ndarray, gt_hm: jnp.ndarray) -> jnp.ndarray:
    """forward2 (pose_loss.py:177-198): channelwise softmax KL,
    F.kl_div default 'mean' reduction = sum / numel."""
    gt_hm = jax.lax.stop_gradient(gt_hm)
    p = jax.nn.log_softmax(pred_hm, axis=1)
    q = jax.nn.softmax(gt_hm, axis=1)
    pointwise = q * (jnp.log(jnp.clip(q, 1e-38)) - p)
    return jnp.mean(pointwise)


class PoseLoss:
    """Heatmap-consistency loss between predicted and ground-truth frames.

    detector: (gt image batch [B,H,W,3] in [0,1]) -> per-sample [N, 6]
              raw boxes (xmin, ymin, xmax, ymax, conf, cls) or None
    pose_fn:  (crop batch [M, 256, 192, 3]) -> heatmaps [M, K, h, w]

    mode 1 = masked per-pixel CE (reference forward1)
    mode 2 = channelwise KL      (reference forward2; trainer default)
    """

    def __init__(self, detector: Optional[Callable] = None,
                 pose_fn: Optional[Callable] = None, mode: int = 2,
                 max_batch: int = 64):
        self.detector = detector
        self.pose_fn = pose_fn
        self.mode = mode
        self.max_batch = max_batch

    @property
    def available(self) -> bool:
        return self.detector is not None and self.pose_fn is not None

    def heatmap_loss(self, pred_hm: jnp.ndarray, gt_hm: jnp.ndarray):
        if self.mode == 2:
            return heatmap_kl_loss(pred_hm, gt_hm)
        return heatmap_ce_loss(pred_hm, gt_hm)

    def __call__(self, pred_img, gt_img) -> jnp.ndarray:
        if not self.available:
            return jnp.asarray(0.0)
        B, H, W = np.asarray(gt_img).shape[:3]
        raw = self.detector(gt_img)
        boxes = [
            process_boxes(r, H, W) if r is not None and len(r) else
            np.zeros((0, 6), np.int64)
            for r in (raw if raw is not None else [None] * B)
        ]
        gt_crops = prepare_crops(gt_img, boxes, max_batch=self.max_batch)
        if gt_crops is None:
            return jnp.asarray(0.0)  # no human detected (pose_loss.py:163-165)
        pred_crops = prepare_crops(pred_img, boxes, max_batch=self.max_batch)
        return self.heatmap_loss(self.pose_fn(pred_crops),
                                 self.pose_fn(gt_crops))
