"""Shared higher-level blocks of the zoo: inverted residuals, pyramid pooling
(PPM), ASPP — the op vocabulary from SURVEY.md §2.1/§2.2.

All blocks are NHWC, bf16-compute-ready, and written so XLA fuses the
elementwise tails into the producing conv.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx
from torch_semantic_segmentation_tpu.ops import dropout as hw_dropout

from torch_semantic_segmentation_tpu.ops.conv import ConvBNAct, make_conv, make_norm
from torch_semantic_segmentation_tpu.ops.pool import adaptive_avg_pool2d, global_avg_pool
from torch_semantic_segmentation_tpu.ops.upsample import resize_bilinear


class InvertedResidual(nnx.Module):
    """MobileNetV2 inverted residual (expand 1×1 → depthwise → project 1×1).

    Used by FastSCNN's global feature extractor and ContextNet (SURVEY.md
    §2.1 "FastSCNN"). Residual add only when stride 1 and in_ch == out_ch.
    """

    def __init__(self, in_ch: int, out_ch: int, *, stride: int = 1,
                 expand_ratio: int = 6, dtype=None, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        hidden = in_ch * expand_ratio
        self.use_res = stride == 1 and in_ch == out_ch
        self.expand = ConvBNAct(in_ch, hidden, 1, act="relu", dtype=dtype,
                                param_dtype=param_dtype, rngs=rngs)
        self.dw = ConvBNAct(hidden, hidden, 3, stride=stride, groups=hidden,
                            act="relu", dtype=dtype, param_dtype=param_dtype,
                            rngs=rngs)
        self.project = ConvBNAct(hidden, out_ch, 1, act=None, dtype=dtype,
                                 param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        y = self._maybe_fused_expand_dw(x)
        if y is None:
            y = self.dw(self.expand(x))
        y = self.project(y)
        return x + y if self.use_res else y

    def _maybe_fused_expand_dw(self, x: jax.Array) -> jax.Array | None:
        """Route training-mode expand(1×1, folded BN) → ReLU → dw3×3
        through the fused Pallas kernel (ops.pallas_mbconv): the expanded
        tensor — the LARGEST activation in the network, 6× the block
        width — never reaches HBM in either the forward or the backward
        (gather-form VJP recomputes it per row). Returns the dw conv
        output run through the dw BN/act; kill switch
        TPU_SEG_PALLAS_MBCONV=0. SURVEY.md §2.1 "FastSCNN" GFE hot spot.
        """
        exp, dw = self.expand, self.dw
        if (exp.bn is None or exp.bn.use_running_average
                or dw.bn is None or dw.bn.use_running_average):
            return None                       # eval: sepconv fold path
        if exp.act is not None or exp._act_name != "relu":
            return None
        ec = exp.conv
        if (ec.kernel_size != (1, 1) or ec.feature_group_count != 1
                or ec.strides not in ((1, 1), 1)
                or ec.padding != ((0, 0), (0, 0))):
            return None
        dc = dw.conv
        hidden = ec.out_features
        if (dc.kernel_size != (3, 3) or dc.feature_group_count != hidden
                or dc.in_features != hidden or dc.use_bias
                or dc.kernel_dilation not in ((1, 1), 1)
                or dc.padding != ((1, 1), (1, 1))):
            return None
        stride = dc.strides[0] if isinstance(dc.strides, tuple) else dc.strides
        from torch_semantic_segmentation_tpu.ops import (folded_bn,
                                                         pallas_mbconv)
        if not pallas_mbconv.enabled():
            return None
        # the kernel folds the expand BN via ops.folded_bn, so it must
        # honor that module's kill switch too: TPU_SEG_FOLDED_BN=0 has to
        # disable EVERY folded-BN computation for a clean numerics A/B
        if not folded_bn.enabled():
            return None
        if not pallas_mbconv.supports(x.shape, hidden, stride):
            return None
        # spatial floor: below it the kernel's fixed costs beat the byte
        # saving — ContextNet's (16,16,32,·) blocks measured a 40% step
        # LOSS routed, while the FastSCNN GFE shapes (≥131K px) win
        # (override: TPU_SEG_PALLAS_MBCONV_MIN_PX)
        import os
        floor = int(os.environ.get("TPU_SEG_PALLAS_MBCONV_MIN_PX", 1 << 17))
        if x.shape[0] * x.shape[1] * x.shape[2] < floor:
            return None
        # the kernel computes in bf16 — only route when the standard
        # path's dw conv output would be bf16 too (dtype parity rule)
        dw_out_dtype = (jnp.dtype(dc.dtype) if dc.dtype is not None
                        else jnp.promote_types(jnp.bfloat16,
                                               dc.kernel.value.dtype))
        if dw_out_dtype != jnp.dtype(jnp.bfloat16) or x.dtype != jnp.bfloat16:
            return None
        w_fold, b_fold = folded_bn.folded_1x1_weights(ec, exp.bn, x)
        k = dc.kernel[...].reshape(3, 3, hidden)
        y = pallas_mbconv.fused_expand_dw(x, w_fold, b_fold, k, stride)
        y = dw.bn(y)
        if dw.act is not None:
            return dw.act(y)
        from torch_semantic_segmentation_tpu.ops.conv import activation
        return activation(dw._act_name)(y)


class PyramidPooling(nnx.Module):
    """PSPNet-style pyramid pooling module (bins 1/2/3/6 by default).

    Each bin: adaptive-avg-pool → 1×1 conv-BN-ReLU → bilinear upsample back;
    concat with the input, then 1×1 fuse conv. Exercised by FastSCNN and
    ICNet (SURVEY.md §2.1).
    """

    def __init__(self, in_ch: int, out_ch: int, *, bins=(1, 2, 3, 6),
                 align_corners: bool = False, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.bins = tuple(bins)
        self.align_corners = align_corners
        branch_ch = in_ch // len(self.bins)
        self.branches = nnx.List([
            ConvBNAct(in_ch, branch_ch, 1, act="relu", dtype=dtype,
                      param_dtype=param_dtype, rngs=rngs)
            for _ in self.bins
        ])
        self.fuse = ConvBNAct(in_ch + branch_ch * len(self.bins), out_ch, 1,
                              act="relu", dtype=dtype, param_dtype=param_dtype,
                              rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        feats = [x]
        for b, conv in zip(self.bins, self.branches):
            y = adaptive_avg_pool2d(x, b)
            y = conv(y)
            feats.append(resize_bilinear(y, (h, w), align_corners=self.align_corners))
        return self.fuse(jnp.concatenate(feats, axis=-1))


class ASPP(nnx.Module):
    """Atrous Spatial Pyramid Pooling (DeepLabV3; SURVEY.md §2.1 "DeepLab").

    Parallel branches: 1×1 conv; 3×3 atrous convs at `rates`; image-level
    pooling (global mean → 1×1 conv → broadcast back). Concat → 1×1 project
    (+ dropout by caller). The image-pool broadcast is a mean-reduce +
    broadcast XLA fuses into the concat (SURVEY.md §2.2 "ASPP").
    """

    def __init__(self, in_ch: int, out_ch: int = 256, *, rates=(6, 12, 18),
                 align_corners: bool = False, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.align_corners = align_corners
        self.conv1 = ConvBNAct(in_ch, out_ch, 1, act="relu", dtype=dtype,
                               param_dtype=param_dtype, rngs=rngs)
        self.atrous = nnx.List([
            ConvBNAct(in_ch, out_ch, 3, dilation=r, act="relu", dtype=dtype,
                      param_dtype=param_dtype, rngs=rngs)
            for r in rates
        ])
        self.image_pool = ConvBNAct(in_ch, out_ch, 1, act="relu", dtype=dtype,
                                    param_dtype=param_dtype, rngs=rngs)
        self.project = ConvBNAct(out_ch * (2 + len(rates)), out_ch, 1,
                                 act="relu", dtype=dtype,
                                 param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        feats = [self.conv1(x)]
        for conv in self.atrous:
            feats.append(conv(x))
        gp = self.image_pool(global_avg_pool(x, keepdims=True))
        feats.append(jnp.broadcast_to(gp, (n, h, w, gp.shape[-1])))
        return self.project(jnp.concatenate(feats, axis=-1))


class SegHead(nnx.Module):
    """Generic classifier head: 3×3 conv-BN-ReLU → dropout → 1×1 logits.

    The shape every aux/main head in the zoo takes (BiSeNet/ICNet aux heads,
    DeepLab head — SURVEY.md §2.1).
    """

    def __init__(self, in_ch: int, mid_ch: int, num_classes: int, *,
                 dropout: float = 0.1, dtype=None, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        self.conv = ConvBNAct(in_ch, mid_ch, 3, act="relu", dtype=dtype,
                              param_dtype=param_dtype, rngs=rngs)
        self.dropout = hw_dropout.Dropout(rate=dropout, rngs=rngs) if dropout > 0 else None
        self.classifier = make_conv(mid_ch, num_classes, 1, use_bias=True,
                                    dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.conv(x)
        if self.dropout is not None:
            x = self.dropout(x)
        return self.classifier(x)
