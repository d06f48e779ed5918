"""Multi-chip scaling: meshes and shardings (dp + spatial)."""

from atmvfi_tpu.parallel.mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    data_only_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_params,
    spatial_sharding,
)

__all__ = [
    "DATA_AXIS",
    "SPATIAL_AXIS",
    "batch_sharding",
    "data_only_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
    "shard_params",
    "spatial_sharding",
]
