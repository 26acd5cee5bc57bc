"""BiSeNet — two-branch real-time network: spatial path + context path.

Per Yu et al. 2018 (arXiv:1808.00897), the model behind the reference's
`models/bisenet.py` (SURVEY.md §2.1 "BiSeNet"; reference file could not be
cited, mount empty). Capability contract (BASELINE.json config 5):
multi-branch real-time model with aux heads + multi-scale eval — train with
`losses.aux_weighted_loss`, evaluate with `eval.make_multiscale_eval_step`.

Structure:
- Spatial path: 3 stride-2 ConvBNReLU (7×7 then 3×3 ×2) + 1×1 → 1/8, 128ch.
- Context path: ResNet-18/34 backbone (stride 32); global-pool tail +
  attention-refinement modules (ARM) on the 1/16 and 1/32 features,
  top-down ×2 refinements.
- Feature fusion module (FFM): concat both paths → 1×1 conv → SE-style
  channel attention (global pool → 1×1 relu → 1×1 sigmoid, scale + add).
- Main head at 1/8 (+2 aux heads on the refined 1/16 & 1/32 features),
  all bilinearly upsampled to input resolution.

TPU-native: the ARM/FFM global-pool attentions are mean-reduce + 1×1 conv
(MXU) + broadcast multiply — XLA fuses the elementwise tails.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx

from torch_semantic_segmentation_tpu.models.resnet import ResNet
from torch_semantic_segmentation_tpu.ops import (
    ConvBNAct, global_avg_pool, make_conv, make_norm, resize_bilinear)


class AttentionRefinement(nnx.Module):
    """ARM: 3×3 conv, then global-pool → 1×1 conv-BN-sigmoid channel gate."""

    def __init__(self, in_ch: int, out_ch: int, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv = ConvBNAct(in_ch, out_ch, 3, act="relu", **kw)
        self.gate_conv = make_conv(out_ch, out_ch, 1, use_bias=False, **kw)
        self.gate_bn = make_norm(out_ch, **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.conv(x)
        g = self.gate_bn(self.gate_conv(global_avg_pool(x)))
        return x * jax.nn.sigmoid(g)


class SpatialPath(nnx.Module):
    def __init__(self, in_ch: int = 3, out_ch: int = 128, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv1 = ConvBNAct(in_ch, 64, 7, stride=2, padding=3, act="relu", **kw)
        self.conv2 = ConvBNAct(64, 64, 3, stride=2, act="relu", **kw)
        self.conv3 = ConvBNAct(64, 64, 3, stride=2, act="relu", **kw)
        self.conv4 = ConvBNAct(64, out_ch, 1, act="relu", **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.conv4(self.conv3(self.conv2(self.conv1(x))))


class ContextPath(nnx.Module):
    """Backbone + global tail + ARMs; returns refined 1/8 and 1/16 feats."""

    def __init__(self, depth: int = 18, out_ch: int = 128, *,
                 align_corners: bool = False, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.align_corners = align_corners
        self.backbone = ResNet(depth, output_stride=32, **kw)
        _, _, c16, c32 = self.backbone.stage_channels
        self.tail = ConvBNAct(c32, out_ch, 1, act="relu", **kw)
        self.arm32 = AttentionRefinement(c32, out_ch, **kw)
        self.refine32 = ConvBNAct(out_ch, out_ch, 3, act="relu", **kw)
        self.arm16 = AttentionRefinement(c16, out_ch, **kw)
        self.refine16 = ConvBNAct(out_ch, out_ch, 3, act="relu", **kw)

    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        _, _, f16, f32 = self.backbone(x)
        tail = self.tail(global_avg_pool(f32))
        y32 = self.arm32(f32) + tail
        y32 = self.refine32(resize_bilinear(
            y32, (f16.shape[1], f16.shape[2]),
            align_corners=self.align_corners))
        y16 = self.arm16(f16) + y32
        y16 = self.refine16(resize_bilinear(
            y16, (f16.shape[1] * 2, f16.shape[2] * 2),
            align_corners=self.align_corners))
        return y16, y32  # 1/8 and 1/16 resolution, out_ch each


class FeatureFusionModule(nnx.Module):
    """Concat → 1×1 conv → SE channel attention (scale + residual add)."""

    def __init__(self, in_ch: int, out_ch: int, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv = ConvBNAct(in_ch, out_ch, 1, act="relu", **kw)
        self.se1 = make_conv(out_ch, out_ch // 4, 1, use_bias=True, **kw)
        self.se2 = make_conv(out_ch // 4, out_ch, 1, use_bias=True, **kw)

    def __call__(self, sp: jax.Array, cp: jax.Array) -> jax.Array:
        x = self.conv(jnp.concatenate([sp, cp], axis=-1))
        g = global_avg_pool(x)
        g = jax.nn.sigmoid(self.se2(jax.nn.relu(self.se1(g))))
        return x + x * g


class BiSeNetHead(nnx.Module):
    def __init__(self, in_ch: int, mid_ch: int, num_classes: int, *,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv = ConvBNAct(in_ch, mid_ch, 3, act="relu", **kw)
        self.cls = make_conv(mid_ch, num_classes, 1, use_bias=True, **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.cls(self.conv(x))


class BiSeNet(nnx.Module):
    """BiSeNet (Yu 2018). Input NHWC float; H, W % 32 == 0.

    Training mode (`aux=True`, default) returns (main, aux16, aux32) logits,
    all at full input resolution — feed to `aux_weighted_loss` (the paper
    uses weight 1.0 per aux head; pass `aux_weight=1.0`). Eval returns main.
    """

    def __init__(self, num_classes: int = 19, *, depth: int = 18,
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
        # False: logits stay at their head resolutions (1/8, 1/8, 1/16);
        # losses.resize_cross_entropy_loss / aux_weighted_loss fuse the
        # upsample in a lane-major layout
        self.upsample_logits = upsample_logits
        ch = 128
        self.spatial = SpatialPath(3, ch, **kw)
        self.context = ContextPath(depth, ch, align_corners=align_corners, **kw)
        self.ffm = FeatureFusionModule(ch * 2, ch * 2, **kw)
        self.head = BiSeNetHead(ch * 2, ch * 2, num_classes, **kw)
        if aux:
            self.aux_head16 = BiSeNetHead(ch, 64, num_classes, **kw)
            self.aux_head32 = BiSeNetHead(ch, 64, num_classes, **kw)

    def __call__(self, x: jax.Array):
        h, w = x.shape[1], x.shape[2]
        if h % 32 or w % 32:
            raise ValueError(
                f"BiSeNet needs H and W divisible by 32; got {h}x{w}")
        sp = self.spatial(x)
        cp8, cp16 = self.context(x)
        y = self.head(self.ffm(sp, cp8))
        # Packed resize head (ops/packed_ops.py): MEASURED NEGATIVE for
        # BiSeNet — three full-res heads (main + 2 aux) route three
        # packed einsum chains and the zoo A/B lost 23% (207.2 → 160.3
        # img/s at b32 768², 2026-08-20 v5lite), so the default stays
        # the plain fused resize; TPU_SEG_PACKED_BISENET=1 opts in
        # (parity tests use it).
        from torch_semantic_segmentation_tpu.ops import packed_ops

        def _up(t):
            return packed_ops.maybe_packed_resize(
                t, (h, w), align_corners=self.align_corners,
                env_var="TPU_SEG_PACKED_BISENET",
                train_mode=packed_ops.module_train_mode(self),
                default_on=False)

        if self.upsample_logits:
            y = _up(y)
        if self.aux:
            a16 = self.aux_head16(cp8)
            a32 = self.aux_head32(cp16)
            if self.upsample_logits:
                a16 = _up(a16)
                a32 = _up(a32)
            return y, a16, a32
        return y


def bisenet(num_classes: int = 19, *, depth: int = 18, aux: bool = True,
            upsample_logits: bool = True, dtype=None, param_dtype=jnp.float32,
            rngs: nnx.Rngs | None = None) -> BiSeNet:
    """Constructor mirroring the reference's `bisenet(num_classes)` API."""
    if rngs is None:
        rngs = nnx.Rngs(0)
    return BiSeNet(num_classes, depth=depth, aux=aux,
                   upsample_logits=upsample_logits, dtype=dtype,
                   param_dtype=param_dtype, rngs=rngs)
