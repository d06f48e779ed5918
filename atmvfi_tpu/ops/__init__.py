"""Core tensor ops (NHWC, static shapes, jit/Pallas-friendly)."""

from atmvfi_tpu.ops.resize import (
    downsample_2x,
    resize_bilinear,
    resize_scale,
    upsample_flow,
)
from atmvfi_tpu.ops.warp import (
    coords_grid,
    flow_warp,
    flow_warp_rows,
    grid_sample_bilinear,
)
from atmvfi_tpu.ops.warp_pallas import flow_warp_blend, flow_warp_dispatch
from atmvfi_tpu.ops.window import (
    attn_mask_for,
    center_depad,
    center_pad,
    pad_amounts,
    relative_coords,
    window_partition,
    window_reverse,
)

__all__ = [
    "attn_mask_for",
    "center_depad",
    "center_pad",
    "coords_grid",
    "downsample_2x",
    "flow_warp",
    "flow_warp_rows",
    "flow_warp_blend",
    "flow_warp_dispatch",
    "grid_sample_bilinear",
    "pad_amounts",
    "relative_coords",
    "resize_bilinear",
    "resize_scale",
    "upsample_flow",
    "window_partition",
    "window_reverse",
]
