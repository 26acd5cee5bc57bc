"""Fast-SCNN — real-time 3-branch segmentation network.

Architecture per Poudel et al. 2019 (arXiv:1902.04502), the model behind the
reference's `models/fastscnn.py` (SURVEY.md §2.1 "FastSCNN"; reference file
could not be cited — /root/reference mount empty, see SURVEY.md provenance
notice).

Capability contract (BASELINE.json config 2): FastSCNN full-res 1024×2048
Cityscapes training with scale/crop/flip augmentation — this is the primary
throughput-benchmark model (BASELINE.md "images/sec/chip").

Structure (SURVEY.md §3.4):
- LearningToDownsample: conv s2 → 2× ds-separable conv s2       (1/8 res)
- GlobalFeatureExtractor: 3 inverted-residual stages (s2,s2,s1)
  + pyramid pooling                                             (1/32 res)
- FeatureFusion: upsample(×4) low-res + dilated dwconv, add 1/8 branch
- Classifier: 2× ds-separable conv → dropout → 1×1 logits → ×8 bilinear

TPU-native: NHWC, bf16-compute-capable, every branch static-shaped; the
×4/×8 bilinear upsamples use the MXU-matmul resize (ops/upsample.py) and are
the designated fusion target of the Pallas upsample(+add/concat) kernel.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx
from torch_semantic_segmentation_tpu.ops import dropout as hw_dropout

from torch_semantic_segmentation_tpu.ops import (
    ConvBNAct,
    InvertedResidual,
    PyramidPooling,
    SeparableConv,
    make_conv,
    make_norm,
    resize_bilinear,
)


class LearningToDownsample(nnx.Module):
    """conv(3→32, s2) → dsconv(32→48, s2) → dsconv(48→64, s2)."""

    def __init__(self, in_ch: int = 3, chs=(32, 48, 64), *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        c1, c2, c3 = chs
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv = ConvBNAct(in_ch, c1, 3, stride=2, act="relu", **kw)
        self.ds1 = SeparableConv(c1, c2, 3, stride=2, **kw)
        self.ds2 = SeparableConv(c2, c3, 3, stride=2, **kw)

    def __call__(self, x) -> jax.Array:
        from torch_semantic_segmentation_tpu.ops import packed_lds
        from torch_semantic_segmentation_tpu.ops.packed_ops import (
            PackedImages)
        if (packed_lds.enabled() and packed_lds.supports(x.shape)
                and packed_lds.routable(self)):
            # Whole-LDS W-packed region (ops/packed_lds.py): same params
            # and BN state, ~8× fewer HBM bytes on TPU lane-padded layouts
            return packed_lds.lds_forward(self, x)
        if isinstance(x, PackedImages):
            x = x.unpack()     # reshape only; XLA cancels it downstream
        return self.ds2(self.ds1(self.conv(x)))


class GlobalFeatureExtractor(nnx.Module):
    """Inverted-residual stages (64,96,128; t=6; n=3 each; s=2,2,1) + PPM."""

    def __init__(self, in_ch: int = 64, chs=(64, 96, 128), out_ch: int = 128,
                 *, expand_ratio: int = 6, num_blocks=(3, 3, 3),
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        def stage(cin, cout, n, stride):
            blocks = [InvertedResidual(cin, cout, stride=stride,
                                       expand_ratio=expand_ratio, **kw)]
            blocks += [InvertedResidual(cout, cout, stride=1,
                                        expand_ratio=expand_ratio, **kw)
                       for _ in range(n - 1)]
            return nnx.List(blocks)

        self.stage1 = stage(in_ch, chs[0], num_blocks[0], 2)
        self.stage2 = stage(chs[0], chs[1], num_blocks[1], 2)
        self.stage3 = stage(chs[1], chs[2], num_blocks[2], 1)
        self.ppm = PyramidPooling(chs[2], out_ch, **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        for st in (self.stage1, self.stage2, self.stage3):
            for blk in st:
                x = blk(x)
        return self.ppm(x)


class FeatureFusion(nnx.Module):
    """Fuse the 1/8 spatial branch with the ×4-upsampled 1/32 context branch.

    Low-res path: bilinear ×4 → dilated depthwise 3×3 BN ReLU → 1×1 BN.
    High-res path: 1×1 BN. Sum → ReLU (Poudel 2019 Table 1 "FFM").
    """

    def __init__(self, high_ch: int = 64, low_ch: int = 128, out_ch: int = 128,
                 *, scale: int = 4, align_corners: bool = False, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.scale = scale
        self.align_corners = align_corners
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.dwconv = ConvBNAct(low_ch, out_ch, 3, dilation=scale,
                                groups=low_ch if low_ch == out_ch else 1,
                                act="relu", **kw)
        self.low_proj = ConvBNAct(out_ch, out_ch, 1, act=None, use_bias=True, **kw)
        self.high_proj = ConvBNAct(high_ch, out_ch, 1, act=None, use_bias=True, **kw)

    def __call__(self, high: jax.Array, low: jax.Array) -> jax.Array:
        from torch_semantic_segmentation_tpu.ops.pallas_sepconv import (
            fuse_conv_pair)
        h, w = high.shape[1], high.shape[2]
        low = resize_bilinear(low, (h, w), align_corners=self.align_corners)
        # folded-BN inference: the dilated dw + 1×1 pair fuses into one
        # Pallas kernel (ops.pallas_sepconv) — None in training/CPU paths
        fused = fuse_conv_pair(self.dwconv, self.low_proj, low)
        if fused is None:
            fused = self.low_proj(self.dwconv(low))
        high = self.high_proj(high)
        return jax.nn.relu(fused + high)


class Classifier(nnx.Module):
    """dsconv ×2 → dropout → 1×1 conv logits (at 1/8 res)."""

    def __init__(self, in_ch: int, num_classes: int, *, dropout: float = 0.1,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.ds1 = SeparableConv(in_ch, in_ch, 3, **kw)
        self.ds2 = SeparableConv(in_ch, in_ch, 3, **kw)
        self.dropout = hw_dropout.Dropout(rate=dropout, rngs=rngs)
        self.conv = make_conv(in_ch, num_classes, 1, use_bias=True,
                              dtype=dtype, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.conv(self.dropout(self.ds2(self.ds1(x))))


class FastSCNN(nnx.Module):
    """Fast-SCNN (Poudel 2019). Input NHWC float; H, W % 32 == 0.

    Returns full-resolution logits (N, H, W, num_classes); with
    `aux=True`, returns (main, aux_lds, aux_gfe) — auxiliary heads on the
    downsample and global branches for deep supervision (upsampled by the
    loss, SURVEY.md §2.6 "Evaluator" / losses.aux_weighted_loss).
    """

    def __init__(self, num_classes: int = 19, in_ch: int = 3, *,
                 aux: bool = False, align_corners: bool = False,
                 upsample_logits: bool = True, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.aux = aux
        # Explicit train/eval flag (packed-head routing contract,
        # packed_ops.module_train_mode): nnx train()/eval() flips
        # this plain bool together with every BatchNorm/Dropout.
        self.use_running_average = False
        self.align_corners = align_corners
        # upsample_logits=False returns the 1/8-res logits so the training
        # loss can fuse the ×8 upsample (losses.resize_cross_entropy_loss);
        # parameters are identical either way.
        self.upsample_logits = upsample_logits
        self.lds = LearningToDownsample(in_ch, (32, 48, 64), **kw)
        self.gfe = GlobalFeatureExtractor(64, (64, 96, 128), 128, **kw)
        self.ffm = FeatureFusion(64, 128, 128, align_corners=align_corners, **kw)
        self.classifier = Classifier(128, num_classes, **kw)
        if aux:
            from torch_semantic_segmentation_tpu.ops.blocks import SegHead
            self.aux_lds = SegHead(64, 32, num_classes, **kw)
            self.aux_gfe = SegHead(128, 32, num_classes, **kw)

    def __call__(self, x: jax.Array):
        h, w = x.shape[1], x.shape[2]
        if h % 32 or w % 32:
            raise ValueError(
                f"FastSCNN needs H and W divisible by 32 (5 stride-2 stages); "
                f"got {h}x{w}")
        hi = self.lds(x)               # 1/8
        lo = self.gfe(hi)              # 1/32
        fused = self.ffm(hi, lo)       # 1/8
        logits = self.classifier(fused)
        if self.upsample_logits:
            # Packed resize head — shared zoo tail (ops/packed_ops.py);
            # TPU_SEG_PACKED_FASTSCNN overrides. (The headline bench
            # path uses upsample_logits=False + the fused Pallas
            # resize-CE loss and never reaches this.)
            from torch_semantic_segmentation_tpu.ops import packed_ops

            logits = packed_ops.maybe_packed_resize(
                logits, (h, w), align_corners=self.align_corners,
                env_var="TPU_SEG_PACKED_FASTSCNN",
                train_mode=packed_ops.module_train_mode(self),
                # measured negative (2026-08-20 zoo A/B: 563.7 -> 424.2 img/s b32 (-25%)):
                # the packed resize head's H-pass intermediate and 5D
                # W-pass output still lane-pad, so it loses to the
                # plain fused resize; TPU_SEG_PACKED_FASTSCNN=1 opts in (parity tests)
                default_on=False)
        if self.aux:
            return logits, self.aux_lds(hi), self.aux_gfe(lo)
        return logits


def fastscnn(num_classes: int = 19, *, aux: bool = False,
             upsample_logits: bool = True, dtype=None,
             param_dtype=jnp.float32, rngs: nnx.Rngs | None = None) -> FastSCNN:
    """Constructor mirroring the reference's `fastscnn(num_classes)` API."""
    if rngs is None:
        rngs = nnx.Rngs(0)
    return FastSCNN(num_classes, aux=aux, upsample_logits=upsample_logits,
                    dtype=dtype, param_dtype=param_dtype, rngs=rngs)
