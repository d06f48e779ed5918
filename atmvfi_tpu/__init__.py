"""atmvfi_tpu — a TPU-native video frame interpolation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
ATM-VFI reference (Gancheekim/ATM-VFI): hybrid CNN + window-transformer
frame interpolation with an Attention-to-Motion operator, dual local /
global motion branches, a coarse-to-fine warping decoder and a residual
refinement U-Net — plus training, evaluation, conversion and serving
subsystems.

Layout:
  ops/       pure tensor ops (backward warp, window utils, resize, convs,
             Pallas kernels) — NHWC, static shapes, jit-friendly
  models/    flax.linen model definitions (base / lite presets)
  losses/    Laplacian pyramid, census, VGG perceptual/style, Sobel, ...
  data/      dataset loaders + augmentation pipelines
  train/     optax-based trainers, phase recipes, schedules
  convert/   PyTorch checkpoint -> JAX pytree converter
  infer/     padded 2-frame inference + streaming video pipeline
  evalkit/   PSNR/SSIM metrics + benchmark harnesses
  parallel/  mesh construction, shardings (dp / spatial)
  utils/     meters, flow viz, image io, seeding
"""

__version__ = "0.1.0"
