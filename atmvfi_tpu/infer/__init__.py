"""Inference: padding, 2-frame interpolation, streaming video."""

from atmvfi_tpu.infer.padder import InputPadder
from atmvfi_tpu.infer.pipeline import InterpolationPipeline, load_pipeline

__all__ = ["InputPadder", "InterpolationPipeline", "load_pipeline"]
