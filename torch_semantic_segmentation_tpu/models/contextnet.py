"""ContextNet — two-branch real-time network: full-res detail branch +
deep context branch on a ×4-downsampled input.

Architecture per Poudel et al. 2018 (BMVC, arXiv:1805.04554, "ContextNet:
Exploring Context and Detail for Semantic Segmentation in Real-time") —
stretch-tier model of the reference zoo (SURVEY.md §2.1; reference
`models/contextnet.py` uncitable, mount empty). FastSCNN's predecessor:
same ds-separable detail stem and FFM-style fusion, but context comes from
a MobileNetV2-style trunk run at quarter resolution.

TPU-native: the ×1/4 context input and ×4 fusion upsample are MXU-matmul
resizes; both branches are static-shape jit subgraphs XLA schedules
concurrently.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx

from torch_semantic_segmentation_tpu.ops import (
    ConvBNAct, InvertedResidual, SeparableConv, make_conv, resize_bilinear)
from torch_semantic_segmentation_tpu.models.fastscnn import (
    Classifier, FeatureFusion)


class DetailBranch(nnx.Module):
    """Full-res spatial branch: conv s2 → 3 ds-separable convs → 1/8, 128ch."""

    def __init__(self, in_ch: int = 3, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv = ConvBNAct(in_ch, 32, 3, stride=2, act="relu", **kw)
        self.ds1 = SeparableConv(32, 64, 3, stride=2, **kw)
        self.ds2 = SeparableConv(64, 128, 3, stride=2, **kw)
        self.ds3 = SeparableConv(128, 128, 3, stride=1, **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.ds3(self.ds2(self.ds1(self.conv(x))))


class ContextBranch(nnx.Module):
    """Deep branch on the ×1/4 input (Poudel 2018 Table 1)."""

    def __init__(self, in_ch: int = 3, out_ch: int = 128, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv = ConvBNAct(in_ch, 32, 3, stride=2, act="relu", **kw)

        def stage(cin, cout, n, stride, t):
            blocks = [InvertedResidual(cin, cout, stride=stride,
                                       expand_ratio=t, **kw)]
            blocks += [InvertedResidual(cout, cout, stride=1, expand_ratio=t,
                                        **kw) for _ in range(n - 1)]
            return blocks

        body: list[nnx.Module] = []
        body += stage(32, 32, 1, 1, 1)
        body += stage(32, 32, 1, 1, 6)
        body += stage(32, 48, 3, 2, 6)
        body += stage(48, 64, 3, 2, 6)
        body += stage(64, 96, 2, 1, 6)
        body += stage(96, 128, 2, 1, 6)
        self.body = nnx.List(body)
        self.tail = ConvBNAct(128, out_ch, 3, act="relu", **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.conv(x)
        for blk in self.body:
            x = blk(x)
        return self.tail(x)


class ContextNet(nnx.Module):
    """ContextNet (Poudel 2018). Input NHWC float; H, W % 32 == 0.

    Detail branch at 1/8; context branch sees the ×1/4 input and ends at
    1/32 of full res; FFM fuses (×4 upsample), classifier emits full-res
    logits. `aux=True` adds heads on both branches (deep supervision).
    """

    def __init__(self, num_classes: int = 19, *, aux: bool = False,
                 align_corners: bool = False, upsample_logits: bool = True,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.aux = aux
        # Explicit train/eval flag (packed-head routing contract,
        # packed_ops.module_train_mode): nnx train()/eval() flips
        # this plain bool together with every BatchNorm/Dropout.
        self.use_running_average = False
        self.align_corners = align_corners
        # False: 1/8-res logits for the fused resize-CE loss
        self.upsample_logits = upsample_logits
        self.detail = DetailBranch(3, **kw)
        self.context = ContextBranch(3, 128, **kw)
        self.ffm = FeatureFusion(128, 128, 128,
                                 align_corners=align_corners, **kw)
        self.classifier = Classifier(128, num_classes, **kw)
        if aux:
            from torch_semantic_segmentation_tpu.ops.blocks import SegHead
            self.aux_detail = SegHead(128, 32, num_classes, **kw)
            self.aux_context = SegHead(128, 32, num_classes, **kw)

    def __call__(self, x: jax.Array):
        h, w = x.shape[1], x.shape[2]
        if h % 32 or w % 32:
            raise ValueError(
                f"ContextNet needs H and W divisible by 32; got {h}x{w}")
        detail = self.detail(x)                                 # 1/8
        x4 = resize_bilinear(x, (h // 4, w // 4),
                             align_corners=self.align_corners)
        context = self.context(x4)                              # 1/32
        fused = self.ffm(detail, context)                       # 1/8
        y = self.classifier(fused)
        if self.upsample_logits:
            # Packed resize head — shared zoo tail (ops/packed_ops.py);
            # TPU_SEG_PACKED_CONTEXTNET overrides.
            from torch_semantic_segmentation_tpu.ops import packed_ops

            y = packed_ops.maybe_packed_resize(
                y, (h, w), align_corners=self.align_corners,
                env_var="TPU_SEG_PACKED_CONTEXTNET",
                train_mode=packed_ops.module_train_mode(self),
                # measured negative (2026-08-20 zoo A/B: 385.1 -> 311.7 img/s b32 (-19%)):
                # the packed resize head's H-pass intermediate and 5D
                # W-pass output still lane-pad, so it loses to the
                # plain fused resize; TPU_SEG_PACKED_CONTEXTNET=1 opts in (parity tests)
                default_on=False)
        if self.aux:
            return y, self.aux_detail(detail), self.aux_context(context)
        return y


def contextnet(num_classes: int = 19, *, aux: bool = False,
               upsample_logits: bool = True, dtype=None,
               param_dtype=jnp.float32,
               rngs: nnx.Rngs | None = None) -> ContextNet:
    """Constructor mirroring the reference's `contextnet(num_classes)` API."""
    if rngs is None:
        rngs = nnx.Rngs(0)
    return ContextNet(num_classes, aux=aux, upsample_logits=upsample_logits,
                      dtype=dtype,
                      param_dtype=param_dtype, rngs=rngs)
