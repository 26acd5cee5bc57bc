"""LEDNet — lightweight encoder–decoder with split-shuffle blocks and an
attention pyramid decoder.

Architecture per Wang et al. 2019 (arXiv:1905.02423, "LEDNet: A Lightweight
Encoder-Decoder Network for Real-Time Semantic Segmentation") —
stretch-tier model of the reference zoo (SURVEY.md §2.1; reference
`models/lednet.py` uncitable, mount empty).

Blocks:
- SS-nbt (split-shuffle non-bottleneck): split channels in half; each half
  runs factorized 3×1/1×3 convs (second pair dilated); concat + residual +
  channel shuffle.
- APN decoder (attention pyramid network): a 3-level 3×3/5×5/7×7 stride-2
  pyramid produces a pixel attention map that scales the 1×1-projected
  features; a global-pool branch adds image-level context; ×8 upsample.

TPU-native: channel split/concat/shuffle are free layout ops under XLA;
the shuffle is a reshape-transpose the compiler folds into the next conv's
input. All pyramid levels are static shapes (input must be %16).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx
from torch_semantic_segmentation_tpu.ops import dropout as hw_dropout

from torch_semantic_segmentation_tpu.models.erfnet import DownsamplerBlock
from torch_semantic_segmentation_tpu.ops import (
    ConvBNAct, global_avg_pool, make_conv, make_norm, resize_bilinear)


def channel_shuffle(x: jax.Array, groups: int = 2) -> jax.Array:
    """ShuffleNet channel shuffle on NHWC (torch channel_shuffle parity:
    groups-major interleave)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = x.transpose(0, 1, 2, 4, 3)
    return x.reshape(n, h, w, c)


class SSnbt(nnx.Module):
    """Split-shuffle non-bottleneck block (LEDNet §3.1)."""

    def __init__(self, ch: int, *, dilation: int = 1, dropout: float = 0.03,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        half = ch // 2
        d = dilation

        def branch():
            return nnx.List([
                make_conv(half, half, (3, 1), padding=(1, 0), use_bias=True, **kw),
                make_conv(half, half, (1, 3), padding=(0, 1), use_bias=True, **kw),
                make_conv(half, half, (3, 1), padding=(d, 0), dilation=(d, 1),
                          use_bias=True, **kw),
                make_conv(half, half, (1, 3), padding=(0, d), dilation=(1, d),
                          use_bias=True, **kw),
            ])

        self.left = branch()
        self.right = branch()
        self.bn_left1 = make_norm(half, **kw)
        self.bn_left2 = make_norm(half, **kw)
        self.bn_right1 = make_norm(half, **kw)
        self.bn_right2 = make_norm(half, **kw)
        self.dropout = hw_dropout.Dropout(rate=dropout, rngs=rngs)

    def _run(self, branch, bn1, bn2, x, *, transposed: bool) -> jax.Array:
        c1, c2, c3, c4 = branch
        # right branch applies the 1×3 before the 3×1 (paper fig. 2)
        order = (c2, c1, c4, c3) if transposed else (c1, c2, c3, c4)
        y = jax.nn.relu(order[0](x))
        y = jax.nn.relu(bn1(order[1](y)))
        y = jax.nn.relu(order[2](y))
        return bn2(order[3](y))

    def __call__(self, x: jax.Array) -> jax.Array:
        half = x.shape[-1] // 2
        xl, xr = x[..., :half], x[..., half:]
        yl = self._run(self.left, self.bn_left1, self.bn_left2, xl,
                       transposed=False)
        yr = self._run(self.right, self.bn_right1, self.bn_right2, xr,
                       transposed=True)
        y = self.dropout(jnp.concatenate([yl, yr], axis=-1))
        return channel_shuffle(jax.nn.relu(y + x), 2)


class APN(nnx.Module):
    """Attention pyramid network decoder head (LEDNet §3.2)."""

    def __init__(self, in_ch: int, num_classes: int, *,
                 align_corners: bool = False, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.align_corners = align_corners
        # pyramid: 3×3/s2 → 5×5/s2 → 7×7/s2, each projecting to num_classes
        self.down1 = ConvBNAct(in_ch, in_ch, 3, stride=2, act="relu", **kw)
        self.down2 = ConvBNAct(in_ch, in_ch, 5, stride=2, padding=2,
                               act="relu", **kw)
        self.down3 = ConvBNAct(in_ch, in_ch, 7, stride=2, padding=3,
                               act="relu", **kw)
        self.level1 = ConvBNAct(in_ch, num_classes, 1, act=None, **kw)
        self.level2 = ConvBNAct(in_ch, num_classes, 1, act=None, **kw)
        self.level3 = ConvBNAct(in_ch, num_classes, 1, act=None, **kw)
        self.main = ConvBNAct(in_ch, num_classes, 1, act=None, **kw)
        self.pool_proj = ConvBNAct(in_ch, num_classes, 1, act=None, **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = x.shape[1], x.shape[2]
        ac = self.align_corners
        d1 = self.down1(x)
        d2 = self.down2(d1)
        d3 = self.down3(d2)
        a = self.level3(d3)
        a = resize_bilinear(a, (d2.shape[1], d2.shape[2]), align_corners=ac)
        a = a + self.level2(d2)
        a = resize_bilinear(a, (d1.shape[1], d1.shape[2]), align_corners=ac)
        a = a + self.level1(d1)
        a = resize_bilinear(a, (h, w), align_corners=ac)
        y = self.main(x) * a
        g = self.pool_proj(global_avg_pool(x))
        return y + g


class LEDNet(nnx.Module):
    """LEDNet (Wang 2019). Input NHWC float; H, W % 16 == 0 (the APN
    pyramid needs the 1/8 grid even)."""

    def __init__(self, num_classes: int = 19, in_ch: int = 3, *,
                 align_corners: bool = False, upsample_logits: bool = True,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.align_corners = align_corners
        # False: 1/8-res APN logits for the fused resize-CE loss
        self.upsample_logits = upsample_logits
        # Explicit train/eval flag (packed-head routing contract,
        # packed_ops.module_train_mode): nnx train()/eval() flips
        # this plain bool together with every BatchNorm/Dropout.
        self.use_running_average = False
        self.encoder = nnx.List(
            [DownsamplerBlock(in_ch, 32, **kw)]
            + [SSnbt(32, **kw) for _ in range(3)]
            + [DownsamplerBlock(32, 64, **kw)]
            + [SSnbt(64, **kw) for _ in range(2)]
            + [DownsamplerBlock(64, 128, **kw)]
            + [SSnbt(128, dilation=d, dropout=0.3, **kw)
               for d in (1, 2, 5, 9, 2, 5, 9, 17)]
        )
        self.apn = APN(128, num_classes, align_corners=align_corners, **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = x.shape[1], x.shape[2]
        if h % 16 or w % 16:
            raise ValueError(f"LEDNet needs H and W divisible by 16; got {h}x{w}")
        if self._route_packed_body(x):
            from torch_semantic_segmentation_tpu.ops import packed_lednet

            x = packed_lednet.encoder_forward(self, x)
        else:
            for blk in self.encoder:
                x = blk(x)
        y = self.apn(x)
        if self.upsample_logits:
            # Packed resize head (ops/packed_ops.py): the ×8 bilinear
            # upsample of C=19 logits otherwise materializes a 6.7×
            # lane-padded full-res tensor; routed (training on TPU;
            # TPU_SEG_PACKED_LEDNET overrides) it emits W-packed
            # PackedLogits the loss consumes natively.
            from torch_semantic_segmentation_tpu.ops import packed_ops

            return packed_ops.maybe_packed_resize(
                y, (h, w), align_corners=self.align_corners,
                env_var="TPU_SEG_PACKED_LEDNET",
                train_mode=packed_ops.module_train_mode(self),
                # measured NEUTRAL (2026-08-20 zoo A/B: 52.9 -> 53.2 img/s b8):
                # within noise either way at LEDNet's shapes — default
                # off for a uniform zoo rule; TPU_SEG_PACKED_LEDNET=1
                # opts in (parity tests)
                default_on=False)
        return y

    def _route_packed_body(self, x: jax.Array) -> bool:
        """Whole-encoder W-packed region (ops/packed_lednet.py): the
        SS-nbt split halves run 16/32/64-channel tensors that NHWC lane
        tiling pads 8×/4×/2× — per-HLO attribution measured the step
        pure bandwidth-bound at ~86 GB/s per fusion. Packed: 52.3 →
        157.4 img/s (+201%, b8 768², 2026-08-20 v5lite same-day pair).
        Training mode on TPU by default; TPU_SEG_PACKED_LEDNET_BODY
        overrides — the same contract as the ENet/ERFNet bodies."""
        from torch_semantic_segmentation_tpu.ops import packed_lednet, packed_ops

        if not packed_ops.route_packed_head(
                "TPU_SEG_PACKED_LEDNET_BODY",
                packed_ops.module_train_mode(self)):
            return False
        return packed_lednet.supports(self, x.shape)


def lednet(num_classes: int = 19, *, upsample_logits: bool = True,
           dtype=None, param_dtype=jnp.float32,
           rngs: nnx.Rngs | None = None) -> LEDNet:
    """Constructor mirroring the reference's `lednet(num_classes)` API."""
    if rngs is None:
        rngs = nnx.Rngs(0)
    return LEDNet(num_classes, upsample_logits=upsample_logits, dtype=dtype,
                  param_dtype=param_dtype, rngs=rngs)
