"""ESNet — symmetric encoder–decoder with factorized conv units.

Architecture per Wang et al. 2019 (arXiv:1906.09826, "ESNet: An Efficient
Symmetric Network for Real-time Semantic Segmentation") — stretch-tier
model of the reference zoo (SURVEY.md §2.1; reference `models/esnet.py`
uncitable, mount empty).

Blocks:
- FCU (factorized convolution unit): 3×1/1×3 pair ×2 with residual (the
  K×1/1×K kernel size varies per stage: K=3 shallow, K=5 mid).
- PFCU (parallel FCU): shared 3×1/1×3 stem, then three parallel dilated
  3×1/1×3 branches (rates 2, 5, 9) summed with the residual.
- ENet-style downsampler; transposed-conv upsamplers.

TPU-native: like ERFNet, all factorized narrow convs on the MXU; the PFCU
branches are independent convs XLA runs from one fused input read.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx
from torch_semantic_segmentation_tpu.ops import dropout as hw_dropout

from torch_semantic_segmentation_tpu.models.erfnet import (
    DownsamplerBlock, UpsamplerBlock)
from torch_semantic_segmentation_tpu.ops import ConvTranspose2d, make_conv, make_norm


class FCU(nnx.Module):
    """Factorized conv unit: (K×1 → 1×K → BN ReLU) ×2 + residual."""

    def __init__(self, ch: int, k: int = 3, *, dropout: float = 0.03,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        p = (k - 1) // 2
        self.conv_a1 = make_conv(ch, ch, (k, 1), padding=(p, 0), use_bias=True, **kw)
        self.conv_a2 = make_conv(ch, ch, (1, k), padding=(0, p), use_bias=True, **kw)
        self.bn1 = make_norm(ch, **kw)
        self.conv_b1 = make_conv(ch, ch, (k, 1), padding=(p, 0), use_bias=True, **kw)
        self.conv_b2 = make_conv(ch, ch, (1, k), padding=(0, p), use_bias=True, **kw)
        self.bn2 = make_norm(ch, **kw)
        self.dropout = hw_dropout.Dropout(rate=dropout, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        y = jax.nn.relu(self.conv_a1(x))
        y = jax.nn.relu(self.bn1(self.conv_a2(y)))
        y = jax.nn.relu(self.conv_b1(y))
        y = self.bn2(self.conv_b2(y))
        y = self.dropout(y)
        return jax.nn.relu(y + x)


class PFCU(nnx.Module):
    """Parallel FCU: shared 3×1/1×3 stem → 3 dilated branches (2,5,9) + res."""

    def __init__(self, ch: int, *, rates=(2, 5, 9), dropout: float = 0.3,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.stem1 = make_conv(ch, ch, (3, 1), padding=(1, 0), use_bias=True, **kw)
        self.stem2 = make_conv(ch, ch, (1, 3), padding=(0, 1), use_bias=True, **kw)
        self.bn_stem = make_norm(ch, **kw)
        self.branch_a = nnx.List([
            make_conv(ch, ch, (3, 1), padding=(r, 0), dilation=(r, 1),
                      use_bias=True, **kw) for r in rates])
        self.branch_b = nnx.List([
            make_conv(ch, ch, (1, 3), padding=(0, r), dilation=(1, r),
                      use_bias=True, **kw) for r in rates])
        self.branch_bn = nnx.List([make_norm(ch, **kw) for _ in rates])
        self.dropout = hw_dropout.Dropout(rate=dropout, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        y = jax.nn.relu(self.stem1(x))
        y = jax.nn.relu(self.bn_stem(self.stem2(y)))
        out = x
        for ca, cb, bn in zip(self.branch_a, self.branch_b, self.branch_bn):
            b = jax.nn.relu(ca(y))
            b = bn(cb(b))
            out = out + self.dropout(b)
        return jax.nn.relu(out)


class ESNet(nnx.Module):
    """ESNet (Wang 2019). Input NHWC float; H, W % 8 == 0."""

    def __init__(self, num_classes: int = 19, in_ch: int = 3, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.encoder = nnx.List(
            [DownsamplerBlock(in_ch, 16, **kw)]
            + [FCU(16, 3, **kw) for _ in range(3)]
            + [DownsamplerBlock(16, 64, **kw)]
            + [FCU(64, 5, **kw) for _ in range(2)]
            + [DownsamplerBlock(64, 128, **kw)]
            + [PFCU(128, **kw) for _ in range(3)]
        )
        self.decoder = nnx.List([
            UpsamplerBlock(128, 64, **kw),
            FCU(64, 5, dropout=0.0, **kw),
            FCU(64, 5, dropout=0.0, **kw),
            UpsamplerBlock(64, 16, **kw),
            FCU(16, 3, dropout=0.0, **kw),
            FCU(16, 3, dropout=0.0, **kw),
        ])
        self.output_conv = ConvTranspose2d(16, num_classes, 2, stride=2,
                                           use_bias=True, **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = x.shape[1], x.shape[2]
        if h % 8 or w % 8:
            raise ValueError(f"ESNet needs H and W divisible by 8; got {h}x{w}")
        # Whole-network packed region — shared ERFNet-family walker
        # (ops/packed_erf.py); TPU_SEG_PACKED_ESNET_BODY overrides.
        from torch_semantic_segmentation_tpu.ops import packed_erf, packed_ops

        train_mode = not self.encoder[0].bn.use_running_average
        if (packed_ops.route_packed_head("TPU_SEG_PACKED_ESNET_BODY",
                                         train_mode)
                and packed_erf.supports(self, x.shape)):
            return packed_erf.forward(self, x)
        for blk in self.encoder:
            x = blk(x)
        for blk in self.decoder:
            x = blk(x)
        # Packed full-res head — same routing as ERFNet (models/erfnet.py);
        # TPU_SEG_PACKED_ESNET overrides.
        from torch_semantic_segmentation_tpu.ops import packed_ops

        bn = self.encoder[0].bn
        if packed_ops.route_packed_head("TPU_SEG_PACKED_ESNET",
                                        not bn.use_running_average):
            y = packed_ops.apply_packed_deconv_head(self.output_conv, x)
            if y is not None:
                return y
        return self.output_conv(x)


def esnet(num_classes: int = 19, *, dtype=None, param_dtype=jnp.float32,
          rngs: nnx.Rngs | None = None) -> ESNet:
    """Constructor mirroring the reference's `esnet(num_classes)` API."""
    if rngs is None:
        rngs = nnx.Rngs(0)
    return ESNet(num_classes, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
