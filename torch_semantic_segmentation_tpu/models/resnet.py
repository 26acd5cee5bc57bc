"""ResNet backbones with dilated (output-stride 8/16) final stages.

Per He et al. 2016 (arXiv:1512.03385) with the DeepLab dilation convention
(Chen et al. 2017, arXiv:1706.05587 §4): replacing stride with dilation in
the last one/two stages so the feature grid stays at 1/8 or 1/16 resolution
— the backbone behind the reference's DeepLab-style models (SURVEY.md §2.1
"DeepLab-style"; reference file could not be cited, mount empty).

torchvision-compatible structure (conv1 7×7/s2 → maxpool 3×3/s2 → 4 stages)
so the compat loader can ingest torchvision-format checkpoints. Multi-grid
dilation (1,2,4) applied inside the final dilated stage as in DeepLabV3.

TPU-native: NHWC, bf16-capable; dilated 3×3 convs lower to MXU convolutions
(XLA handles atrous via kernel dilation natively).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx

from torch_semantic_segmentation_tpu.ops import ConvBNAct, make_conv, make_norm, max_pool2d


class BasicBlock(nnx.Module):
    """ResNet-18/34 block: 3×3 → 3×3 with identity/projection shortcut."""

    expansion = 1

    def __init__(self, in_ch: int, ch: int, *, stride: int = 1,
                 dilation: int = 1, dtype=None, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv1 = ConvBNAct(in_ch, ch, 3, stride=stride, dilation=dilation,
                               act="relu", **kw)
        self.conv2 = ConvBNAct(ch, ch, 3, dilation=dilation, act=None, **kw)
        self.down = (
            ConvBNAct(in_ch, ch, 1, stride=stride, act=None, **kw)
            if stride != 1 or in_ch != ch else None
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        y = self.conv2(self.conv1(x))
        skip = self.down(x) if self.down is not None else x
        return jax.nn.relu(y + skip)


class BottleneckBlock(nnx.Module):
    """ResNet-50+ block: 1×1 reduce → 3×3 → 1×1 expand (×4)."""

    expansion = 4

    def __init__(self, in_ch: int, ch: int, *, stride: int = 1,
                 dilation: int = 1, dtype=None, param_dtype=jnp.float32,
                 rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        out_ch = ch * self.expansion
        self.conv1 = ConvBNAct(in_ch, ch, 1, act="relu", **kw)
        self.conv2 = ConvBNAct(ch, ch, 3, stride=stride, dilation=dilation,
                               act="relu", **kw)
        self.conv3 = ConvBNAct(ch, out_ch, 1, act=None, **kw)
        self.down = (
            ConvBNAct(in_ch, out_ch, 1, stride=stride, act=None, **kw)
            if stride != 1 or in_ch != out_ch else None
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        y = self.conv3(self.conv2(self.conv1(x)))
        skip = self.down(x) if self.down is not None else x
        return jax.nn.relu(y + skip)


_LAYOUTS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (BottleneckBlock, (3, 4, 6, 3)),
    101: (BottleneckBlock, (3, 4, 23, 3)),
}


class ResNet(nnx.Module):
    """Dilated ResNet feature extractor.

    Returns (c1, c2, c3, c4): all four stage outputs (at 1/4, 1/8, then
    1/8·s3, 1/`output_stride` resolution depending on the dilation plan) —
    DeepLab consumes (c3, c4), BiSeNet's context path (c2, c3, c4).
    Per-stage channel counts are in `self.stage_channels`.
    """

    def __init__(self, depth: int = 50, in_ch: int = 3, *,
                 output_stride: int = 16, multi_grid=(1, 2, 4), dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        if depth not in _LAYOUTS:
            raise ValueError(f"depth must be one of {sorted(_LAYOUTS)}")
        if output_stride not in (8, 16, 32):
            raise ValueError("output_stride must be 8, 16 or 32")
        block, counts = _LAYOUTS[depth]
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.block_expansion = block.expansion

        self.stem = ConvBNAct(in_ch, 64, 7, stride=2, padding=3, act="relu", **kw)

        # stage strides/dilations per output stride (DeepLabV3 §4.1)
        if output_stride == 8:
            strides, dils = (1, 2, 1, 1), (1, 1, 2, 4)
        elif output_stride == 16:
            strides, dils = (1, 2, 2, 1), (1, 1, 1, 2)
        else:
            strides, dils = (1, 2, 2, 2), (1, 1, 1, 1)

        chans = (64, 128, 256, 512)
        in_c = 64
        stages = []
        for si, (ch, n, st, dl) in enumerate(zip(chans, counts, strides, dils)):
            blocks = []
            for bi in range(n):
                mg = multi_grid[min(bi, len(multi_grid) - 1)] \
                    if (si == 3 and dl > 1) else 1
                blocks.append(block(
                    in_c, ch, stride=st if bi == 0 else 1,
                    dilation=dl * mg, **kw))
                in_c = ch * block.expansion
            stages.append(nnx.List(blocks))
        self.stage1, self.stage2, self.stage3, self.stage4 = stages
        self.out_channels = in_c
        self.stage_channels = tuple(c * block.expansion for c in chans)
        self.c3_channels = self.stage_channels[2]

    def __call__(self, x: jax.Array
                 ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        x = self.stem(x)
        x = max_pool2d(x, 3, stride=2, padding=1)
        feats = []
        for stage in (self.stage1, self.stage2, self.stage3, self.stage4):
            for blk in stage:
                x = blk(x)
            feats.append(x)
        return tuple(feats)


def resnet(depth: int = 50, **kwargs) -> ResNet:
    return ResNet(depth, **kwargs)
