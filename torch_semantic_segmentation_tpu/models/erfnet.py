"""ERFNet — efficient residual factorized convnet.

Architecture per Romera et al. 2017 (IEEE T-ITS, "ERFNet: Efficient Residual
Factorized ConvNet for Real-Time Semantic Segmentation") — stretch-tier
model of the reference zoo (SURVEY.md §2.1 "ContextNet, LEDNet, ERFNet,
ESNet"; reference `models/erfnet.py` uncitable, mount empty).

Blocks:
- DownsamplerBlock (ENet-style): 3×3/s2 conv (out−in ch) ∥ 2×2 maxpool,
  concat → BN → ReLU.
- non-bottleneck-1d: factorized 3×1/1×3 pairs (second pair dilated) with
  dropout + residual.

TPU-native: the asymmetric 3×1/1×3 factorizations are narrow MXU convs XLA
pipelines back-to-back; all-residual topology keeps activation footprints
flat for full-res training.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx
from torch_semantic_segmentation_tpu.ops import dropout as hw_dropout

from torch_semantic_segmentation_tpu.ops import (
    ConvTranspose2d, make_conv, make_norm, max_pool2d)


class DownsamplerBlock(nnx.Module):
    def __init__(self, in_ch: int, out_ch: int, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv = make_conv(in_ch, out_ch - in_ch, 3, stride=2, padding=1,
                              use_bias=True, **kw)
        self.bn = make_norm(out_ch, **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        y = jnp.concatenate([self.conv(x), max_pool2d(x, 2)], axis=-1)
        return jax.nn.relu(self.bn(y))


class NonBottleneck1d(nnx.Module):
    """3×1→1×3 (→BN ReLU) →3×1→1×3 dilated (→BN) + dropout + residual."""

    def __init__(self, ch: int, *, dilation: int = 1, dropout: float = 0.3,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        d = dilation
        self.conv3x1_1 = make_conv(ch, ch, (3, 1), padding=(1, 0),
                                   use_bias=True, **kw)
        self.conv1x3_1 = make_conv(ch, ch, (1, 3), padding=(0, 1),
                                   use_bias=True, **kw)
        self.bn1 = make_norm(ch, **kw)
        self.conv3x1_2 = make_conv(ch, ch, (3, 1), padding=(d, 0),
                                   dilation=(d, 1), use_bias=True, **kw)
        self.conv1x3_2 = make_conv(ch, ch, (1, 3), padding=(0, d),
                                   dilation=(1, d), use_bias=True, **kw)
        self.bn2 = make_norm(ch, **kw)
        self.dropout = hw_dropout.Dropout(rate=dropout, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        y = jax.nn.relu(self.conv3x1_1(x))
        y = jax.nn.relu(self.bn1(self.conv1x3_1(y)))
        y = jax.nn.relu(self.conv3x1_2(y))
        y = self.bn2(self.conv1x3_2(y))
        y = self.dropout(y)
        return jax.nn.relu(y + x)


class UpsamplerBlock(nnx.Module):
    def __init__(self, in_ch: int, out_ch: int, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv = ConvTranspose2d(in_ch, out_ch, 3, stride=2, padding=1,
                                    output_padding=1, use_bias=True, **kw)
        self.bn = make_norm(out_ch, **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        return jax.nn.relu(self.bn(self.conv(x)))


class ERFNet(nnx.Module):
    """ERFNet (Romera 2017). Input NHWC float; H, W % 8 == 0."""

    def __init__(self, num_classes: int = 19, in_ch: int = 3, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        enc: list[nnx.Module] = [DownsamplerBlock(in_ch, 16, **kw),
                                 DownsamplerBlock(16, 64, **kw)]
        enc += [NonBottleneck1d(64, dropout=0.03, **kw) for _ in range(5)]
        enc.append(DownsamplerBlock(64, 128, **kw))
        for _ in range(2):
            for d in (2, 4, 8, 16):
                enc.append(NonBottleneck1d(128, dilation=d, dropout=0.3, **kw))
        self.encoder = nnx.List(enc)

        self.decoder = nnx.List([
            UpsamplerBlock(128, 64, **kw),
            NonBottleneck1d(64, dropout=0.0, **kw),
            NonBottleneck1d(64, dropout=0.0, **kw),
            UpsamplerBlock(64, 16, **kw),
            NonBottleneck1d(16, dropout=0.0, **kw),
            NonBottleneck1d(16, dropout=0.0, **kw),
        ])
        self.output_conv = ConvTranspose2d(16, num_classes, 2, stride=2,
                                           use_bias=True, **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = x.shape[1], x.shape[2]
        if h % 8 or w % 8:
            raise ValueError(f"ERFNet needs H and W divisible by 8; got {h}x{w}")
        # Whole-network packed region (ops/packed_erf.py): default ON
        # since round 5. The round-4 A/B measured the body −12% (72.3 →
        # 63.4 b8) and turned it off, but the loss was entirely the
        # gather/scatter KERNEL-BUILD plumbing, not the packed layout:
        # with the structured static-slice build
        # (packed_ops._Plan.kernel, round 5) the same body measures
        # 73.2 → 144.1 img/s (+97%, b8 768², 2026-08-20 v5lite same-day
        # pair). TPU_SEG_PACKED_ERFNET_BODY=0 opts out.
        from torch_semantic_segmentation_tpu.ops import packed_erf, packed_ops

        train_mode = not self.encoder[0].bn.use_running_average
        if (packed_ops.route_packed_head("TPU_SEG_PACKED_ERFNET_BODY",
                                         train_mode)
                and packed_erf.supports(self, x.shape)):
            return packed_erf.forward(self, x)
        for blk in self.encoder:
            x = blk(x)
        for blk in self.decoder:
            x = blk(x)
        # Packed full-res head (ops/packed_ops.py): the k2/s2 output
        # deconv emits C=num_classes logits at FULL resolution, which TPU
        # tiling lane-pads 128/C× (6.7× at C=19). Routed (training mode on
        # TPU; TPU_SEG_PACKED_ERFNET overrides), the deconv emits
        # W-packed PackedLogits the loss consumes natively — identical
        # math up to float reassociation (tests/test_packed_enet.py).
        from torch_semantic_segmentation_tpu.ops import packed_ops

        bn = self.encoder[0].bn
        if packed_ops.route_packed_head("TPU_SEG_PACKED_ERFNET",
                                        not bn.use_running_average):
            y = packed_ops.apply_packed_deconv_head(self.output_conv, x)
            if y is not None:
                return y
        return self.output_conv(x)


def erfnet(num_classes: int = 19, *, dtype=None, param_dtype=jnp.float32,
           rngs: nnx.Rngs | None = None) -> ERFNet:
    """Constructor mirroring the reference's `erfnet(num_classes)` API."""
    if rngs is None:
        rngs = nnx.Rngs(0)
    return ERFNet(num_classes, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
