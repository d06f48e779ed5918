"""Inference pipeline: padded 2-frame interpolation + streaming video.

TPU-native serve path replacing `inference_2frame` and the mp4 loop of
the reference demo (/root/reference/demo_2x.py:54-87,129-168):

  * One jitted XLA graph per (padded resolution, flags) bucket — the
    jit cache is keyed on shapes, so heterogeneous inputs (SNU/Xiph)
    compile once per bucket and reuse.
  * Recursive 2x/4x/8x interpolation keeps frames device-resident in
    HBM between iterations; the host only decodes/encodes.
  * bf16 compute by default on TPU (f32 accumulate in softmax/norms),
    f32 reference mode for parity gating.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from atmvfi_tpu.infer.padder import InputPadder
from atmvfi_tpu.models import Network, get_config


class InterpolationPipeline:
    """Stateful wrapper: model variant + weights -> frame interpolator.

    Multi-chip serving: pass `mesh` (an ('data', 'spatial') mesh from
    atmvfi_tpu.parallel.make_mesh) — the counted roofline (PERF_NOTES
    round 3) caps exact lite at ~17 fps/chip at 4K, so the 4K >=30 fps
    target is a multi-chip configuration by physics. Two schedules via
    `spmd`:

      * "spatial" (default): manual-SPMD shard_map serving
        (parallel/spatial.py) — per-shard slabs KEEP every Pallas
        kernel; warps sample all-gathered full frames. B == 1.
        Ensemble mode runs on this path too (replicated multiscale
        estimate + shallow cut — quality protocol, not the latency
        one).
      * "gspmd": the automatic-partitioner path. GSPMD cannot
        partition custom calls, so this forces the XLA op
        implementations (warp/conv/attention "xla", tail off) —
        2-3x slower per chip, but supports every model mode.
    """

    def __init__(self, variables, variant: str = "base", dtype=jnp.bfloat16,
                 global_motion: bool = True, ensemble_global_motion: bool = False,
                 pad_divisor: int = 64, donate: bool = True,
                 fast: bool = False, mesh=None, spmd: str = "spatial"):
        self.cfg = get_config(variant, dtype=dtype)
        if fast:
            # serving profile: unchecked slab warps + composed full-res
            # warps (ATMVFIConfig.fast; deviation measured in PERF_NOTES)
            self.cfg = self.cfg.fast()
        self.mesh = mesh
        self._sharding = None
        self._spatial_fwd = None
        multi = mesh is not None and mesh.devices.size > 1
        if multi:
            from atmvfi_tpu.parallel import (
                SPATIAL_AXIS, replicated, spatial_sharding,
            )

            n_sp = mesh.shape[SPATIAL_AXIS]
            # make_spatial_forward requires H % (8 * n_sp) == 0; check
            # it here so invalid mesh/pad combinations fail at
            # construction rather than on the first interpolate()
            assert pad_divisor % (8 * n_sp) == 0, (
                f"pad_divisor {pad_divisor} must be a multiple of "
                f"8 * spatial mesh extent ({8 * n_sp}) so padded heights "
                f"shard evenly in 8-row units"
            )
            if spmd == "gspmd":
                # GSPMD cannot partition custom calls: keep everything
                # on XLA ops under the automatic partitioner
                self.cfg = dataclasses.replace(
                    self.cfg, warp_impl="xla", conv_impl="xla",
                    attention_impl="xla", tail_planar="off",
                )
            else:
                assert spmd == "spatial", f"unknown spmd mode {spmd!r}"
            variables = jax.device_put(variables, replicated(mesh))
            self._sharding = spatial_sharding(mesh)
        self.net = Network(self.cfg)
        self.variables = variables
        self.global_motion = global_motion
        self.ensemble = ensemble_global_motion
        self.pad_divisor = pad_divisor
        if multi and spmd == "spatial":
            from atmvfi_tpu.parallel.spatial import make_spatial_forward

            self._spatial_fwd = jax.jit(make_spatial_forward(
                self.net, mesh, global_motion=global_motion,
                ensemble_global_motion=ensemble_global_motion,
            ))
        self._fwd = jax.jit(
            self._forward,
            static_argnames=("global_motion", "ensemble_global_motion"),
        )

    def _forward(self, variables, im0, im1, global_motion, ensemble_global_motion):
        out = self.net.apply(
            variables, im0, im1,
            global_motion=global_motion,
            ensemble_global_motion=ensemble_global_motion,
        )
        return jnp.clip(out["I_t"], 0.0, 1.0).astype(jnp.float32)

    def set_window_sizes(self, local: int = None, global_: int = None,
                         enhance: int = None) -> None:
        """Reconfigure attention window sizes at runtime (params reused).

        Parity: __set_local_window_size__ / __set_global_window_size__
        (reference network_base.py:262-270). Triggers a recompile on
        next call; weights are window-size independent.
        """
        self.cfg = self.cfg.with_windows(local, global_, enhance)
        self.net = Network(self.cfg)
        if self._spatial_fwd is not None:
            from atmvfi_tpu.parallel.spatial import make_spatial_forward

            self._spatial_fwd = jax.jit(make_spatial_forward(
                self.net, self.mesh, global_motion=self.global_motion,
                ensemble_global_motion=self.ensemble,
            ))
        self._fwd = jax.jit(
            self._forward,
            static_argnames=("global_motion", "ensemble_global_motion"),
        )

    # ------------------------------------------------------------------
    def interpolate_device(self, im0: jnp.ndarray, im1: jnp.ndarray) -> jnp.ndarray:
        """Padded NHWC float frames on device -> middle frame (device)."""
        if self._sharding is not None:
            # H-shard the activations; a no-op when already placed
            im0 = jax.device_put(im0, self._sharding)
            im1 = jax.device_put(im1, self._sharding)
        if self._spatial_fwd is not None:
            assert im0.shape[0] == 1, "spatial shard_map serving is B == 1"
            return self._spatial_fwd(self.variables, im0, im1)
        return self._fwd(
            self.variables, im0, im1,
            global_motion=self.global_motion,
            ensemble_global_motion=self.ensemble,
        )

    def interpolate(self, img0: np.ndarray, img1: np.ndarray) -> np.ndarray:
        """uint8 RGB [H, W, 3] x2 -> uint8 middle frame.

        Parity with inference_2frame (demo_2x.py:54-87): /255 normalize,
        replicate-pad to divisor, forward, unpad, round to uint8.
        """
        x0 = jnp.asarray(img0, jnp.float32)[None] / 255.0
        x1 = jnp.asarray(img1, jnp.float32)[None] / 255.0
        padder = InputPadder(x0.shape, divisor=self.pad_divisor)
        x0, x1 = padder.pad(x0, x1)
        mid = padder.unpad(self.interpolate_device(x0, x1))
        return np.asarray(
            jnp.round(jnp.clip(mid[0], 0, 1) * 255.0).astype(jnp.uint8)
        )

    # ------------------------------------------------------------------
    def interpolate_stream(self, frames: Iterable[np.ndarray],
                           factor: int = 2) -> Iterable[np.ndarray]:
        """Streaming Nx interpolation over a frame iterable (uint8 RGB).

        Yields factor output frames per input step (the last source frame
        included); intermediate tensors stay in HBM — each decoded frame
        is uploaded once and reused as the next step's `prev` without a
        host round-trip (unlike the reference loop, which re-uploads).
        """
        assert factor in (2, 4, 8), "factor must be a power of 2 (2/4/8)"
        prev_dev = None
        padder = None
        for frame in frames:
            x = jnp.asarray(frame, jnp.float32)[None] / 255.0
            if padder is None:
                padder = InputPadder(x.shape, divisor=self.pad_divisor)
            x = padder.pad(x)
            if prev_dev is not None:
                for mid in self._recursive_midpoints(prev_dev, x, factor):
                    yield self._to_uint8(padder.unpad(mid))
            prev_dev = x
        if prev_dev is not None:
            yield self._to_uint8(padder.unpad(prev_dev))

    def _recursive_midpoints(self, a, b, factor) -> List[jnp.ndarray]:
        """In-order frames strictly between a and b, plus a itself first."""
        if factor == 2:
            return [a, self.interpolate_device(a, b)]
        mid = self.interpolate_device(a, b)
        left = self._recursive_midpoints(a, mid, factor // 2)
        right = self._recursive_midpoints(mid, b, factor // 2)
        return left + right

    # ------------------------------------------------------------------
    def interpolate_stream_batched(self, frames: Iterable[np.ndarray],
                                   factor: int = 2,
                                   batch: int = 4) -> Iterable[np.ndarray]:
        """Batched-throughput Nx interpolation over a frame iterable.

        Groups `batch` consecutive (prev, next) pairs into ONE forward
        call — video 2x interpolation is embarrassingly parallel across
        pairs. Output order matches `interpolate_stream`; values are
        bit-identical on a given backend up to XLA reduction-order ulp
        differences between the batch-1 and batch-N graphs (verified
        bit-exact on CPU). A short final tail is padded to `batch` by
        repeating the last pair (extra outputs dropped), so the whole
        stream runs through ONE compiled graph shape.
        """
        assert factor in (2, 4, 8), "factor must be a power of 2 (2/4/8)"
        assert batch >= 1
        padder = None
        pend: List[jnp.ndarray] = []  # padded device frames, oldest first
        flushed = False  # whether the batch-N graph has been compiled

        for frame in frames:
            x = jnp.asarray(frame, jnp.float32)[None] / 255.0
            if padder is None:
                padder = InputPadder(x.shape, divisor=self.pad_divisor)
            pend.append(padder.pad(x))
            if len(pend) == batch + 1:
                a = jnp.concatenate(pend[:-1], axis=0)
                b = jnp.concatenate(pend[1:], axis=0)
                seq = self._recursive_midpoints(a, b, factor)
                flushed = True
                for i in range(batch):
                    for f in seq:
                        yield self._to_uint8(padder.unpad(f[i : i + 1]))
                pend = pend[-1:]
        if padder is None:
            return
        if len(pend) >= 2:
            # short tail: if the batch-N graph already exists, pad to
            # `batch` pairs by repeating the last pair so it's reused
            # (a smaller batch would force a second multi-minute jit
            # compile of the full model) and drop the extra outputs;
            # for streams shorter than one full batch, run at the
            # actual size instead of compiling an oversized graph
            k = len(pend) - 1
            if flushed:
                a_list = pend[:-1] + [pend[-2]] * (batch - k)
                b_list = pend[1:] + [pend[-1]] * (batch - k)
            else:
                a_list, b_list = pend[:-1], pend[1:]
            a = jnp.concatenate(a_list, axis=0)
            b = jnp.concatenate(b_list, axis=0)
            seq = self._recursive_midpoints(a, b, factor)
            for i in range(k):
                for f in seq:
                    yield self._to_uint8(padder.unpad(f[i : i + 1]))
        yield self._to_uint8(padder.unpad(pend[-1]))

    @staticmethod
    def _to_uint8(x) -> np.ndarray:
        return np.asarray(
            jnp.round(jnp.clip(x[0], 0, 1) * 255.0).astype(jnp.uint8)
        )


def load_pipeline(checkpoint_path: str, variant: str = "base",
                  dtype=jnp.bfloat16, **kw) -> InterpolationPipeline:
    """Build a pipeline from a .pt (torch) or .npz (native) checkpoint."""
    if checkpoint_path.endswith(".pt") or checkpoint_path.endswith(".pth"):
        from atmvfi_tpu.convert import load_torch_checkpoint

        variables, meta = load_torch_checkpoint(checkpoint_path)
        if meta:
            print(f"checkpoint meta: {list(meta.keys())}")
    else:
        from atmvfi_tpu.train.checkpoints import load_params_npz

        variables = load_params_npz(checkpoint_path)
    return InterpolationPipeline(variables, variant=variant, dtype=dtype, **kw)
