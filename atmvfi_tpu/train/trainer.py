"""Training engine: jitted data-parallel train/eval steps + epoch loop.

Functional re-design of the reference Trainer / finetune Trainer
(/root/reference/trainer.py, finetune_trainer.py):

  * one jitted, donated train step — forward, loss switchboard,
    AdamW(0.9/0.999, wd 1e-4) with cosine+warmup schedule, masked by
    the phase's trainability partition (phases.trainable_mask)
  * data-parallel by construction: batches are sharded over the mesh's
    'data' axis; XLA inserts the gradient all-reduce over ICI
  * loss switchboard parity (trainer.py:64-76, criterion :158-210):
    Laplacian, multiscale warping (per-scale LapLoss with shrinking
    max_levels), Charbonnier L1, VGG perceptual/style, census
    bidirectional warp, Sobel, pose (gated)
  * alternating multi-dataset epochs (finetune_trainer.py:362-366)
  * per-epoch checkpointing with metric metadata (trainer.py:434-446)
"""
from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from atmvfi_tpu import losses, ops
from atmvfi_tpu.models import Network, get_config
from atmvfi_tpu.train import checkpoints
from atmvfi_tpu.train.phases import PhaseConfig, trainable_mask
from atmvfi_tpu.train.schedule import cosine_with_linear_warmup
from atmvfi_tpu.utils import AverageMeterGroups


class TrainState(train_state.TrainState):
    pass


def psnr_metric(pred, gt, max_val: float = 1.0):
    """Trainer PSNR: 10*log10(MAX/mse) per sample, then mean
    (reference trainer.py:212-227 — note MAX/mse, not MAX^2/mse)."""
    mse = jnp.mean((pred - gt) ** 2, axis=(1, 2, 3))
    return jnp.mean(10.0 * jnp.log10(max_val / mse))


def make_criterion(phase: PhaseConfig,
                   perceptual_loss: Optional[Callable] = None,
                   pose_loss: Optional[Callable] = None):
    """Build the loss switchboard closure: (output, label) -> (loss, dict)."""

    def criterion(output, label):
        pred = output["I_t"]
        loss = 0.0
        ld: Dict[str, jnp.ndarray] = {}
        if phase.use_l1_loss:
            ld["l1_loss"] = phase.l1_w * losses.charbonnier_loss(pred, label)
            loss = loss + ld["l1_loss"]
        if phase.use_lap_loss:
            ld["lap_loss"] = phase.lap_w * losses.lap_loss(pred, label, 5)
            loss = loss + ld["lap_loss"]
        if phase.use_warping_loss:
            # per-scale Laplacian with shrinking levels (trainer.py:175-187)
            w = 0.0
            label_s = label
            im_t_list = output["im_t_list"]
            for scale, im_t in enumerate(im_t_list):
                max_levels = min(5 - (scale - 1), 5)
                # guard: tiny coarse scales can't support deep pyramids
                max_levels = min(max_levels, _max_pyr_levels(im_t.shape[1:3]))
                w = w + losses.lap_loss(im_t, label_s, max_levels)
                if scale < len(im_t_list) - 1:
                    label_s = ops.downsample_2x(label_s)
            ld["warping_loss"] = phase.warping_w * w
            loss = loss + ld["warping_loss"]
        if (phase.use_perceptual_loss or phase.use_style_loss) and perceptual_loss:
            p, s = perceptual_loss(pred, label)
            if phase.use_perceptual_loss:
                ld["perceptual_loss"] = phase.perceptual_w * p
                loss = loss + ld["perceptual_loss"]
            if phase.use_style_loss:
                ld["style_loss"] = phase.style_w * s
                loss = loss + ld["style_loss"]
        if phase.use_bidirect_warp_loss:
            b = 0.0
            for w0, w1 in zip(output["im0_warped_list"], output["im1_warped_list"]):
                b = b + losses.census_loss(w0, w1)
            ld["bidirect_warp_loss"] = phase.bidirect_w * b
            loss = loss + ld["bidirect_warp_loss"]
        if phase.use_sobel_loss:
            ld["sobel_loss"] = phase.sobel_w * losses.sobel_loss(pred, label)
            loss = loss + ld["sobel_loss"]
        if phase.use_pose_loss and pose_loss is not None:
            ld["pose_loss"] = phase.pose_w * pose_loss(pred, label)
            loss = loss + ld["pose_loss"]
        return loss, ld

    return criterion


def _max_pyr_levels(hw) -> int:
    """Levels for which reflect-pad-2 stays valid (dim//2^k > 2)."""
    m = min(int(hw[0]), int(hw[1]))
    levels = 0
    while m > 4 and levels < 5:
        m //= 2
        levels += 1
    return max(levels, 1)


@dataclasses.dataclass
class TrainerConfig:
    phase: PhaseConfig
    variant: str = "base"
    dtype: Any = jnp.float32
    steps_per_epoch: int = 1000  # len(train_loader); used for T_max
    num_epochs: Optional[int] = None  # default: phase.num_epochs
    resume: bool = False
    grad_accum: int = 1  # reference useGradientAccumulate (trainer.py:35-36)
    clip_grad_norm: Optional[float] = None  # reference isClipGradient=False
    checkpoint_dir: str = "checkpoints"
    seed: int = 0


class Trainer:
    def __init__(self, config: TrainerConfig, mesh=None,
                 perceptual_loss: Optional[Callable] = None,
                 pose_loss: Optional[Callable] = None,
                 init_variables: Optional[Dict] = None):
        self.c = config
        self.phase = config.phase
        self.mesh = mesh
        self.cfg = get_config(config.variant, dtype=config.dtype)
        self.net = Network(self.cfg)
        self.criterion = make_criterion(self.phase, perceptual_loss, pose_loss)

        epochs = config.num_epochs or self.phase.num_epochs
        t_max = epochs * config.steps_per_epoch // max(config.grad_accum, 1)
        if len(self.phase.datasets) > 1:
            t_max //= 2  # alternating loaders (trainer.py:57-58)
        warmup = (
            self.phase.warmup_steps_resume if config.resume
            else self.phase.warmup_steps
        )
        self.schedule = cosine_with_linear_warmup(
            self.phase.init_lr, self.phase.last_lr, max(t_max, 1), warmup
        )
        self.num_epochs = epochs

        if init_variables is None:
            rng = jax.random.PRNGKey(config.seed)
            dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
            init_variables = self.net.init(
                rng, dummy, dummy, global_motion=True
            )
        params = init_variables["params"]

        tx = self._make_optimizer(params)
        self.state = TrainState.create(
            apply_fn=self.net.apply, params=params, tx=tx
        )
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    # ------------------------------------------------------------------
    def _make_optimizer(self, params):
        chain = []
        if self.c.clip_grad_norm:
            chain.append(optax.clip_by_global_norm(self.c.clip_grad_norm))
        chain.append(
            optax.adamw(
                learning_rate=self.schedule, b1=0.9, b2=0.999,
                weight_decay=self.phase.weight_decay,
            )
        )
        tx = optax.chain(*chain)
        mask = trainable_mask(
            params, self.phase.train_local, self.phase.train_global,
            self.phase.refiner_only,
        )
        labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
        if self.c.grad_accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=self.c.grad_accum)
        return tx

    def _shard_batch(self, arr):
        if self.mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            arr, NamedSharding(self.mesh, P("data", None, None, None))
        )

    def _build_train_step(self):
        gm = self.phase.global_motion
        criterion = self.criterion

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: TrainState, im0, gt, im1):
            def loss_fn(params):
                out = state.apply_fn(
                    {"params": params}, im0, im1, global_motion=gm
                )
                loss, ld = criterion(out, gt)
                return loss, (ld, out["I_t"])

            (loss, (ld, pred)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            new_state = state.apply_gradients(grads=grads)
            metrics = {"loss": loss, "psnr": psnr_metric(pred, gt), **ld}
            return new_state, metrics

        return step

    def _build_eval_step(self):
        gm = self.phase.global_motion
        criterion = self.criterion

        @jax.jit
        def step(params, im0, gt, im1):
            out = self.net.apply({"params": params}, im0, im1, global_motion=gm)
            loss, ld = criterion(out, gt)
            return {"loss": loss, "psnr": psnr_metric(out["I_t"], gt), **ld}

        return step

    # ------------------------------------------------------------------
    def train_epoch(self, loader, max_iters: Optional[int] = None) -> Dict:
        meters = AverageMeterGroups()
        for i, (im0, gt, im1) in enumerate(loader):
            if max_iters is not None and i >= max_iters:
                break
            self.state, metrics = self._train_step(
                self.state,
                self._shard_batch(im0),
                self._shard_batch(gt),
                self._shard_batch(im1),
            )
            meters.update({k: float(v) for k, v in metrics.items()})
        return {k: m.avg for k, m in meters.meter_dict.items()}

    def eval_epoch(self, loader, max_iters: Optional[int] = None) -> Dict:
        meters = AverageMeterGroups()
        for i, (im0, gt, im1) in enumerate(loader):
            if max_iters is not None and i >= max_iters:
                break
            metrics = self._eval_step(
                self.state.params,
                self._shard_batch(im0),
                self._shard_batch(gt),
                self._shard_batch(im1),
            )
            meters.update({k: float(v) for k, v in metrics.items()})
        return {k: m.avg for k, m in meters.meter_dict.items()}

    def visualize_batch(self, im0, gt, im1, out_dir: str, index: int) -> str:
        """Validation montage like the reference visualizer
        (trainer.py:280-343): inputs, prediction, GT, flows, occlusion."""
        from atmvfi_tpu.utils.visualize import save_prediction

        out = jax.jit(
            self.net.apply, static_argnames=("global_motion",)
        )({"params": self.state.params}, jnp.asarray(im0), jnp.asarray(im1),
          global_motion=self.phase.global_motion)
        pred = np.asarray(out["I_t"][0], np.float32)
        p = float(psnr_metric(out["I_t"][:1], jnp.asarray(gt[:1])))
        return save_prediction(
            im0[0], im1[0], pred, gt[0], out_dir, index, psnr=p,
            flow0=np.asarray(out["opt_flow_0"][0], np.float32),
            flow1=np.asarray(out["opt_flow_1"][0], np.float32),
            occ=np.asarray(out["occ_mask1"][0], np.float32),
        )

    @staticmethod
    def format_metric_deltas(current: Dict, previous: Optional[Dict]) -> str:
        """Per-metric values with +/- deltas vs the previous epoch
        (reference log_metrics_value, trainer.py:229-249)."""
        parts = []
        for k, v in current.items():
            if previous and k in previous:
                diff = v - previous[k]
                sign = "+" if diff > 0 else ""
                parts.append(f"{k}: {v:.5f}({sign}{diff:.5f})")
            else:
                parts.append(f"{k}: {v:.5f}")
        return "  ".join(parts)

    def fit(self, train_loaders: Sequence, val_loader,
            max_iters: Optional[int] = None, log_fn: Callable = print,
            checkpoint_prefix: str = "", viz_dir: Optional[str] = None,
            alternate_every: int = 1) -> List[Dict]:
        """Full loop: alternate datasets per epoch (every
        `alternate_every` epochs — the reference phase trainer swaps the
        joint dataset every 2 epochs, the finetune trainer every 1),
        validate, checkpoint."""
        os.makedirs(self.c.checkpoint_dir, exist_ok=True)
        history = []
        prev_train, prev_val = None, None
        for epoch in range(self.num_epochs):
            loader = train_loaders[
                (epoch // max(alternate_every, 1)) % len(train_loaders)
            ]
            t0 = time.time()
            train_m = self.train_epoch(loader, max_iters)
            val_m = self.eval_epoch(val_loader, max_iters)
            if viz_dir is not None:
                for im0, gt, im1 in val_loader:
                    self.visualize_batch(im0, gt, im1, viz_dir, epoch)
                    break
            dt = time.time() - t0
            record = {"epoch": epoch, "train": train_m, "val": val_m, "sec": dt}
            history.append(record)
            log_fn(
                f"[{self.phase.name}] epoch {epoch} ({dt:.1f}s)\n"
                f"  train: {self.format_metric_deltas(train_m, prev_train)}\n"
                f"  val:   {self.format_metric_deltas(val_m, prev_val)}"
            )
            prev_train, prev_val = train_m, val_m
            psnr = val_m.get("psnr", 0.0)
            name = (
                f"{checkpoint_prefix}{self.phase.name}_epoch_{epoch}"
                f"_psnr_{psnr:.4f}.npz"
            )
            checkpoints.save_params_npz(
                os.path.join(self.c.checkpoint_dir, name),
                {"params": jax.device_get(self.state.params)},
                meta={"epoch": epoch, "phase": self.phase.name,
                      "train_metric": train_m, "val_metric": val_m},
            )
        return history
