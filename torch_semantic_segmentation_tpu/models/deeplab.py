"""DeepLabV3 — dilated-ResNet backbone + ASPP head.

Per Chen et al. 2017 (arXiv:1706.05587); the reference's DeepLab-style model
(SURVEY.md §2.1 "DeepLab-style"; reference file could not be cited, mount
empty). Capability contract (BASELINE.json config 4): "DeepLab-style ResNet
+ dilated backbone + ASPP with OHEM cross-entropy" — pair with
`losses.ohem_cross_entropy` at train time.

TPU-native: ASPP's parallel atrous branches are independent MXU convs XLA
schedules together; the image-level pool broadcast fuses into the concat;
final ×`output_stride` bilinear upsample is the MXU-matmul resize.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx
from torch_semantic_segmentation_tpu.ops import dropout as hw_dropout

from torch_semantic_segmentation_tpu.models.resnet import ResNet
from torch_semantic_segmentation_tpu.ops import ASPP, make_conv, resize_bilinear
from torch_semantic_segmentation_tpu.ops.blocks import SegHead


class DeepLabV3(nnx.Module):
    """DeepLabV3 (Chen 2017). Input NHWC float.

    Returns full-res logits; with `aux=True` (FCN aux head on the stage-3
    features, the torchvision/reference training recipe) returns
    (main, aux) — the loss resizes aux to the label grid.
    """

    def __init__(self, num_classes: int = 19, *, depth: int = 50,
                 output_stride: int = 16, aspp_channels: int = 256,
                 aux: bool = False, align_corners: bool = False,
                 upsample_logits: bool = True,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.aux = aux
        # Explicit train/eval flag (packed-head routing contract,
        # packed_ops.module_train_mode): nnx train()/eval() flips
        # this plain bool together with every BatchNorm/Dropout.
        self.use_running_average = False
        self.align_corners = align_corners
        # False: return output-stride-res logits; pair with
        # losses.resize_cross_entropy_loss (lane-major fused upsample)
        self.upsample_logits = upsample_logits
        self.backbone = ResNet(depth, output_stride=output_stride, **kw)
        # ASPP rates double at output-stride 8 (DeepLabV3 §4.2)
        rates = (12, 24, 36) if output_stride == 8 else (6, 12, 18)
        self.aspp = ASPP(self.backbone.out_channels, aspp_channels,
                         rates=rates, align_corners=align_corners, **kw)
        self.dropout = hw_dropout.Dropout(rate=0.1, rngs=rngs)
        self.classifier = make_conv(aspp_channels, num_classes, 1,
                                    use_bias=True, **kw)
        if aux:
            self.aux_head = SegHead(self.backbone.c3_channels,
                                    aspp_channels // 2, num_classes, **kw)

    def __call__(self, x: jax.Array):
        h, w = x.shape[1], x.shape[2]
        _, _, c3, c4 = self.backbone(x)
        y = self.classifier(self.dropout(self.aspp(c4)))
        if self.upsample_logits:
            # Packed resize head — shared zoo tail (ops/packed_ops.py);
            # TPU_SEG_PACKED_DEEPLAB overrides.
            from torch_semantic_segmentation_tpu.ops import packed_ops

            y = packed_ops.maybe_packed_resize(
                y, (h, w), align_corners=self.align_corners,
                env_var="TPU_SEG_PACKED_DEEPLAB",
                train_mode=packed_ops.module_train_mode(self),
                # measured negative (2026-08-20 zoo A/B: 270.1 -> 230.3 img/s b32 (-15%, resnet18)):
                # the packed resize head's H-pass intermediate and 5D
                # W-pass output still lane-pad, so it loses to the
                # plain fused resize; TPU_SEG_PACKED_DEEPLAB=1 opts in (parity tests)
                default_on=False)
        if self.aux:
            return y, self.aux_head(c3)
        return y


def _make(depth):
    def ctor(num_classes: int = 19, *, output_stride: int = 16,
             aux: bool = False, upsample_logits: bool = True, dtype=None,
             param_dtype=jnp.float32,
             rngs: nnx.Rngs | None = None) -> DeepLabV3:
        if rngs is None:
            rngs = nnx.Rngs(0)
        return DeepLabV3(num_classes, depth=depth, output_stride=output_stride,
                         aux=aux, upsample_logits=upsample_logits,
                         dtype=dtype, param_dtype=param_dtype, rngs=rngs)
    ctor.__name__ = f"deeplabv3_resnet{depth}"
    ctor.__doc__ = (f"DeepLabV3 with a dilated ResNet-{depth} backbone "
                    f"(reference DeepLab-style constructor parity).")
    return ctor


deeplabv3_resnet18 = _make(18)
deeplabv3_resnet34 = _make(34)
deeplabv3_resnet50 = _make(50)
deeplabv3_resnet101 = _make(101)
