"""ICNet — three-resolution cascade with cascade feature fusion + label
guidance.

Per Zhao et al. 2018 (arXiv:1704.08545), the model behind the reference's
`models/icnet.py` (SURVEY.md §2.1 "ICNet"; reference file could not be
cited, mount empty). Capability contract (BASELINE.json config 5):
multi-branch real-time model with aux heads (cascade label guidance) +
multi-scale eval.

Cascade (resolutions relative to the input):
- sub1 (full res): 3 stride-2 ConvBNReLU → 1/8, 64ch
- sub2 (×1/2 input): backbone stem..stage2 → 1/16, C2 ch
- sub4 (sub2 feature ×1/2): dilated stage3+stage4 + pyramid pooling → 1/32
- CFF(sub4→sub2) at 1/16 → CFF(→sub1) at 1/8 → ×2 up + classifier → ×4 up
- Cascade label guidance: aux classifiers on the two CFF low-res inputs.

TPU-native: each branch is static-shaped; the ×1/2 downsamples and all
cascade upsamples are MXU-matmul bilinear resizes; sub4 reuses sub2's
features (shared trunk) so the heavy backbone runs once per step.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx

from torch_semantic_segmentation_tpu.models.resnet import ResNet
from torch_semantic_segmentation_tpu.ops import (
    ConvBNAct, PyramidPooling, make_conv, make_norm, resize_bilinear)


class CascadeFeatureFusion(nnx.Module):
    """CFF (Zhao 2018 §3.2): upsample low ×2 → dilated 3×3 conv; project
    high with 1×1 conv-BN; sum → ReLU. Also returns the upsampled low map
    for the cascade-label-guidance aux classifier."""

    def __init__(self, low_ch: int, high_ch: int, out_ch: int, *,
                 align_corners: bool = False, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.align_corners = align_corners
        self.low_conv = ConvBNAct(low_ch, out_ch, 3, dilation=2, act=None, **kw)
        self.high_conv = ConvBNAct(high_ch, out_ch, 1, act=None, **kw)

    def __call__(self, low: jax.Array, high: jax.Array
                 ) -> tuple[jax.Array, jax.Array]:
        low_up = resize_bilinear(low, (high.shape[1], high.shape[2]),
                                 align_corners=self.align_corners)
        fused = jax.nn.relu(self.low_conv(low_up) + self.high_conv(high))
        return fused, low_up


class ICNet(nnx.Module):
    """ICNet (Zhao 2018). Input NHWC float; H, W % 32 == 0.

    Training mode (`aux=True`, default) returns (main, aux_sub2, aux_sub4)
    full-res logits for `aux_weighted_loss` (paper cascade-guidance weight
    0.4). Eval returns main only.
    """

    def __init__(self, num_classes: int = 19, *, depth: int = 50,
                 aux: bool = True, align_corners: bool = False,
                 upsample_logits: bool = True, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.aux = aux
        # Explicit train/eval flag (packed-head routing contract,
        # packed_ops.module_train_mode): nnx train()/eval() flips
        # this plain bool together with every BatchNorm/Dropout.
        self.use_running_average = False
        self.align_corners = align_corners
        # False: main logits stay at 1/4 res for the fused resize-CE loss
        self.upsample_logits = upsample_logits

        # sub1: full-res spatial branch
        self.sub1 = nnx.List([
            ConvBNAct(3, 32, 3, stride=2, act="relu", **kw),
            ConvBNAct(32, 32, 3, stride=2, act="relu", **kw),
            ConvBNAct(32, 64, 3, stride=2, act="relu", **kw),
        ])

        # shared trunk on the ×1/2 input (stem..stage2), dilated tail for sub4
        self.backbone = ResNet(depth, output_stride=8, **kw)
        c2_ch = self.backbone.stage_channels[1]
        c4_ch = self.backbone.out_channels
        self.ppm = PyramidPooling(c4_ch, 256, align_corners=align_corners, **kw)

        self.cff24 = CascadeFeatureFusion(256, c2_ch, 128,
                                          align_corners=align_corners, **kw)
        self.cff12 = CascadeFeatureFusion(128, 64, 128,
                                          align_corners=align_corners, **kw)
        self.classifier = make_conv(128, num_classes, 1, use_bias=True, **kw)
        if aux:
            self.aux_cls2 = make_conv(256, num_classes, 1, use_bias=True, **kw)
            self.aux_cls1 = make_conv(128, num_classes, 1, use_bias=True, **kw)

    def _trunk_to_stage2(self, x: jax.Array) -> jax.Array:
        from torch_semantic_segmentation_tpu.ops import max_pool2d
        bb = self.backbone
        x = bb.stem(x)
        x = max_pool2d(x, 3, stride=2, padding=1)
        for blk in bb.stage1:
            x = blk(x)
        for blk in bb.stage2:
            x = blk(x)
        return x

    def _trunk_tail(self, x: jax.Array) -> jax.Array:
        bb = self.backbone
        for blk in bb.stage3:
            x = blk(x)
        for blk in bb.stage4:
            x = blk(x)
        return self.ppm(x)

    def __call__(self, x: jax.Array):
        h, w = x.shape[1], x.shape[2]
        if h % 32 or w % 32:
            raise ValueError(f"ICNet needs H and W divisible by 32; got {h}x{w}")
        ac = self.align_corners

        f1 = x
        for blk in self.sub1:
            f1 = blk(f1)                                    # 1/8, 64

        x2 = resize_bilinear(x, (h // 2, w // 2), align_corners=ac)
        f2 = self._trunk_to_stage2(x2)                       # 1/16, C2

        f4 = resize_bilinear(f2, (f2.shape[1] // 2, f2.shape[2] // 2),
                             align_corners=ac)               # 1/32 trunk input
        f4 = self._trunk_tail(f4)                            # 1/32, 256

        fused2, low_up2 = self.cff24(f4, f2)                 # 1/16, 128
        fused1, low_up1 = self.cff12(fused2, f1)             # 1/8, 128

        y = resize_bilinear(fused1, (h // 4, w // 4), align_corners=ac)
        y = self.classifier(y)
        if self.upsample_logits:
            # Packed resize head — shared zoo tail (ops/packed_ops.py);
            # TPU_SEG_PACKED_ICNET overrides.
            from torch_semantic_segmentation_tpu.ops import packed_ops

            y = packed_ops.maybe_packed_resize(
                y, (h, w), align_corners=ac,
                env_var="TPU_SEG_PACKED_ICNET",
                train_mode=packed_ops.module_train_mode(self),
                # measured negative (2026-08-20 zoo A/B: 216.0 -> 206.7 img/s b32, -4%):
                # the packed resize head's H-pass intermediate and 5D
                # W-pass output still lane-pad, so it loses to the
                # plain fused resize; TPU_SEG_PACKED_ICNET=1 opts in (parity tests)
                default_on=False)
        if self.aux:
            a2 = self.aux_cls2(low_up2)                      # 1/16 grid
            a1 = self.aux_cls1(low_up1)                      # 1/8 grid
            return y, a1, a2
        return y


def icnet(num_classes: int = 19, *, depth: int = 50, aux: bool = True,
          upsample_logits: bool = True, dtype=None, param_dtype=jnp.float32,
          rngs: nnx.Rngs | None = None) -> ICNet:
    """Constructor mirroring the reference's `icnet(num_classes)` API."""
    if rngs is None:
        rngs = nnx.Rngs(0)
    return ICNet(num_classes, depth=depth, aux=aux,
                 upsample_logits=upsample_logits, dtype=dtype,
                 param_dtype=param_dtype, rngs=rngs)
