"""Ops layer (T1 in SURVEY.md §1): NN building blocks with torch-parity
numerics on TPU-native layouts (NHWC/HWIO), plus Pallas fusion kernels."""

from torch_semantic_segmentation_tpu.ops.conv import (
    ConvBNAct,
    ConvTranspose2d,
    PReLU,
    SeparableConv,
    activation,
    make_conv,
    make_norm,
)
from torch_semantic_segmentation_tpu.ops.pool import (
    adaptive_avg_pool2d,
    avg_pool2d,
    global_avg_pool,
    max_pool2d,
    max_pool2x2_with_indices,
    max_unpool2x2,
)
from torch_semantic_segmentation_tpu.ops.pallas_upsample import (
    upsample2x_concat,
)
from torch_semantic_segmentation_tpu.ops.upsample import (
    resize_argmax,
    resize_bilinear,
    resize_nearest,
    upsample2x_bilinear,
)
from torch_semantic_segmentation_tpu.ops.blocks import (
    ASPP,
    InvertedResidual,
    PyramidPooling,
    SegHead,
)

__all__ = [
    "ASPP", "ConvBNAct", "ConvTranspose2d", "InvertedResidual", "PReLU",
    "PyramidPooling", "SegHead", "SeparableConv", "activation",
    "adaptive_avg_pool2d", "avg_pool2d", "global_avg_pool", "make_conv",
    "make_norm", "max_pool2d", "max_pool2x2_with_indices", "max_unpool2x2",
    "resize_argmax", "resize_bilinear", "resize_nearest", "upsample2x_bilinear",
    "upsample2x_concat",
]
