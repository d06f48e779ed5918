"""Evaluation: metrics + benchmark harness runners."""

from atmvfi_tpu.evalkit.metrics import ie, msssim, psnr, ssim, ssim_matlab

__all__ = ["ie", "msssim", "psnr", "ssim", "ssim_matlab"]
