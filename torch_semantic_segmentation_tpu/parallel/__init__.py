"""Distributed runtime (T5 in SURVEY.md §1): data-parallel (and optional
spatial-parallel) training over a `jax.sharding.Mesh`.

The reference's parallelism is DDP with NCCL all-reduce hidden in backward
hooks (SURVEY.md §2.4). TPU-native replacement: there is NO hand-written
communication layer — we lay out a device mesh, shard the batch over the
'data' axis (and optionally the activation H dimension over a 'spatial'
axis for full-res models), replicate parameters, and let XLA/GSPMD compile
the gradient psum / halo exchanges into the single step program over ICI.
Multi-slice (DCN) scaling later just adds an outer mesh axis.
"""

from torch_semantic_segmentation_tpu.parallel.mesh import (
    batch_sharding,
    check_spatial_extent,
    data_parallel_mesh,
    hybrid_batch_sharding,
    hybrid_data_parallel_mesh,
    label_sharding,
    replicate,
    shard_batch,
)

__all__ = [
    "batch_sharding", "check_spatial_extent", "data_parallel_mesh",
    "hybrid_batch_sharding",
    "hybrid_data_parallel_mesh", "label_sharding", "replicate", "shard_batch",
]
