"""ENet — real-time encoder–decoder segmentation network.

Architecture per Paszke et al. 2016 (arXiv:1606.02147), the model behind the
reference's `models/enet.py` (SURVEY.md §2.1 "ENet"; reference file could not
be cited — /root/reference mount empty, see SURVEY.md provenance notice).

Capability contract (BASELINE.json config 1): ENet on Cityscapes 512×512
crops, batch 4, single-device fwd + CE loss, CPU-runnable.

Op vocabulary exercised: dilated conv, asymmetric 5×1/1×5 conv, 2×2-strided
downsample with max-pool index forwarding, max-unpool decoder, transposed
conv, PReLU, spatial (channel) dropout — see ops/ for the TPU-native
implementations (max-unpool is a vectorised one-hot placement, no scatter).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx
from torch_semantic_segmentation_tpu.ops import dropout as hw_dropout

from torch_semantic_segmentation_tpu.ops import (
    ConvBNAct,
    ConvTranspose2d,
    PReLU,
    make_conv,
    make_norm,
    max_pool2d,
    max_pool2x2_with_indices,
    max_unpool2x2,
)


class InitialBlock(nnx.Module):
    """3×3/s2 conv (13 ch) concat 2×2 max-pool of the input → 16 ch."""

    def __init__(self, in_ch: int = 3, out_ch: int = 16, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.conv = make_conv(in_ch, out_ch - in_ch, 3, stride=2, padding=1,
                              use_bias=False, dtype=dtype,
                              param_dtype=param_dtype, rngs=rngs)
        self.bn = make_norm(out_ch, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.act = PReLU(out_ch, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        y = jnp.concatenate([self.conv(x), max_pool2d(x, 2)], axis=-1)
        return self.act(self.bn(y))


class Bottleneck(nnx.Module):
    """ENet bottleneck. kind ∈ {'regular','dilated','asymmetric','down','up'}.

    Main branch: 1×1 project (2×2/s2 conv for 'down') → middle conv → 1×1
    expand → spatial dropout. Skip branch: identity / max-pool(+channel
    zero-pad) with index capture ('down') / 1×1 conv + max-unpool ('up').
    Add, PReLU.
    """

    def __init__(self, in_ch: int, out_ch: int, *, kind: str = "regular",
                 dilation: int = 1, dropout: float = 0.1, projection_ratio: int = 4,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.kind = kind
        self.in_ch, self.out_ch = in_ch, out_ch
        mid = in_ch // projection_ratio

        if kind == "down":
            self.proj = ConvBNAct(in_ch, mid, 2, stride=2, padding=0,
                                  prelu=True, dtype=dtype,
                                  param_dtype=param_dtype, rngs=rngs)
        else:
            self.proj = ConvBNAct(in_ch, mid, 1, prelu=True, dtype=dtype,
                                  param_dtype=param_dtype, rngs=rngs)

        if kind == "asymmetric":
            self.mid_a = ConvBNAct(mid, mid, (5, 1), padding=(2, 0), prelu=True,
                                   dtype=dtype, param_dtype=param_dtype, rngs=rngs)
            self.mid_b = ConvBNAct(mid, mid, (1, 5), padding=(0, 2), prelu=True,
                                   dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        elif kind == "up":
            self.mid_deconv = ConvTranspose2d(mid, mid, 3, stride=2, padding=1,
                                              output_padding=1, use_bias=False,
                                              dtype=dtype, param_dtype=param_dtype,
                                              rngs=rngs)
            self.mid_bn = make_norm(mid, dtype=dtype, param_dtype=param_dtype,
                                    rngs=rngs)
            self.mid_act = PReLU(mid, param_dtype=param_dtype, rngs=rngs)
        else:
            self.mid = ConvBNAct(mid, mid, 3, dilation=dilation, prelu=True,
                                 dtype=dtype, param_dtype=param_dtype, rngs=rngs)

        self.expand = ConvBNAct(mid, out_ch, 1, act=None, dtype=dtype,
                                param_dtype=param_dtype, rngs=rngs)
        # spatial dropout: drop whole feature maps (broadcast over H, W)
        self.dropout = hw_dropout.Dropout(rate=dropout, broadcast_dims=(1, 2), rngs=rngs)

        if kind == "up":
            self.skip_conv = ConvBNAct(in_ch, out_ch, 1, act=None, dtype=dtype,
                                       param_dtype=param_dtype, rngs=rngs)
        self.out_act = PReLU(out_ch, param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jax.Array, indices: jax.Array | None = None
                 ) -> jax.Array | tuple[jax.Array, jax.Array]:
        # main branch
        y = self.proj(x)
        if self.kind == "asymmetric":
            y = self.mid_b(self.mid_a(y))
        elif self.kind == "up":
            y = self.mid_act(self.mid_bn(self.mid_deconv(y)))
        else:
            y = self.mid(y)
        y = self.dropout(self.expand(y))

        # skip branch
        if self.kind == "down":
            skip, idx = max_pool2x2_with_indices(x)
            if self.out_ch > self.in_ch:
                pad = self.out_ch - self.in_ch
                skip = jnp.pad(skip, ((0, 0), (0, 0), (0, 0), (0, pad)))
            out = self.out_act(y + skip)
            return out, idx
        elif self.kind == "up":
            assert indices is not None, "up-bottleneck needs encoder pool indices"
            skip = max_unpool2x2(self.skip_conv(x), indices)
            return self.out_act(y + skip)
        else:
            return self.out_act(y + x)


class ENet(nnx.Module):
    """ENet (Paszke 2016). Input NHWC uint8-normalised float; H, W % 8 == 0.

    Returns full-resolution logits (N, H, W, num_classes).
    """

    def __init__(self, num_classes: int = 19, in_ch: int = 3, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.initial = InitialBlock(in_ch, 16, **kw)

        # stage 1: 16 -> 64, 1 down + 4 regular, p=0.01
        self.down1 = Bottleneck(16, 64, kind="down", dropout=0.01, **kw)
        self.stage1 = nnx.List([
            Bottleneck(64, 64, kind="regular", dropout=0.01, **kw)
            for _ in range(4)
        ])

        # stage 2: 64 -> 128, 1 down + the canonical 8-block pattern, p=0.1
        self.down2 = Bottleneck(64, 128, kind="down", dropout=0.1, **kw)

        def s2_blocks():
            return nnx.List([
                Bottleneck(128, 128, kind="regular", dropout=0.1, **kw),
                Bottleneck(128, 128, kind="dilated", dilation=2, dropout=0.1, **kw),
                Bottleneck(128, 128, kind="asymmetric", dropout=0.1, **kw),
                Bottleneck(128, 128, kind="dilated", dilation=4, dropout=0.1, **kw),
                Bottleneck(128, 128, kind="regular", dropout=0.1, **kw),
                Bottleneck(128, 128, kind="dilated", dilation=8, dropout=0.1, **kw),
                Bottleneck(128, 128, kind="asymmetric", dropout=0.1, **kw),
                Bottleneck(128, 128, kind="dilated", dilation=16, dropout=0.1, **kw),
            ])

        self.stage2 = s2_blocks()
        # stage 3: same pattern, no downsample
        self.stage3 = s2_blocks()

        # decoder
        self.up4 = Bottleneck(128, 64, kind="up", dropout=0.1, **kw)
        self.stage4 = nnx.List([
            Bottleneck(64, 64, kind="regular", dropout=0.1, **kw)
            for _ in range(2)
        ])
        self.up5 = Bottleneck(64, 16, kind="up", dropout=0.1, **kw)
        self.stage5 = nnx.List([
            Bottleneck(16, 16, kind="regular", dropout=0.1, **kw)
        ])
        self.fullconv = ConvTranspose2d(16, num_classes, 3, stride=2, padding=1,
                                        output_padding=1, use_bias=True,
                                        dtype=dtype, param_dtype=param_dtype,
                                        rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = x.shape[1], x.shape[2]
        if h % 8 or w % 8:
            raise ValueError(
                f"ENet needs H and W divisible by 8 (3 stride-2 stages with "
                f"max-unpool index forwarding); got {h}x{w}")
        if self._route_packed_body(x):
            from torch_semantic_segmentation_tpu.ops import packed_enet
            return packed_enet.forward(self, x)
        x = self.initial(x)
        x, idx1 = self.down1(x)
        for blk in self.stage1:
            x = blk(x)
        x, idx2 = self.down2(x)
        for blk in self.stage2:
            x = blk(x)
        for blk in self.stage3:
            x = blk(x)
        x = self.up4(x, idx2)
        for blk in self.stage4:
            x = blk(x)
        x = self.up5(x, idx1)
        for blk in self.stage5:
            x = blk(x)
        if self._route_packed_head(x):
            return self._packed_head(x)
        return self.fullconv(x)

    # -- packed full-res head (ops/packed_ops.py) -------------------------
    #
    # The final transposed conv emits C=num_classes logits at FULL
    # resolution; TPU tiling lane-pads that minor dim to 128 (6.7× at
    # C=19), and the measured plain-CE tail on those padded tensors is
    # 115 ms of a 456 ms b32/768² train step (scripts/diag_enet_parts.py).
    # Routed, the deconv emits logits in a W-packed (N, H, W/P, P·C)
    # layout as ONE standard XLA conv with a structured kernel, and the
    # loss consumes them packed (losses.cross_entropy_loss PackedLogits
    # path) — the padded full-res tensor never exists. Identical math up
    # to float reassociation (tests/test_packed_enet.py).

    def _route_packed_body(self, x: jax.Array) -> bool:
        """Whole-network packed region (ops/packed_enet.py): every /2
        and /4 activation rides the W-packed layout, not just the final
        logits. Same routing contract as the head (training mode on
        TPU; TPU_SEG_PACKED_ENET_BODY overrides); the head-only route
        below stays as the fallback for unsupported widths."""
        from torch_semantic_segmentation_tpu.ops import packed_enet, packed_ops

        bn = getattr(self.down1.proj, "bn", None)
        train_mode = bn is not None and not bn.use_running_average
        if not packed_ops.route_packed_head("TPU_SEG_PACKED_ENET_BODY",
                                            train_mode):
            return False
        return packed_enet.supports(self, x.shape)

    def _route_packed_head(self, x: jax.Array) -> bool:
        from torch_semantic_segmentation_tpu.ops import packed_ops

        bn = getattr(self.down1.proj, "bn", None)
        train_mode = bn is not None and not bn.use_running_average
        if not packed_ops.route_packed_head("TPU_SEG_PACKED_ENET",
                                            train_mode):
            return False
        return packed_ops.pick_head_pack(
            self.fullconv.out_features, x.shape[2],
            self.fullconv.stride[1]) is not None

    def _packed_head(self, x: jax.Array):
        from torch_semantic_segmentation_tpu.ops import packed_ops

        return packed_ops.apply_packed_deconv_head(self.fullconv, x)


def enet(num_classes: int = 19, *, dtype=None, param_dtype=jnp.float32,
         rngs: nnx.Rngs | None = None) -> ENet:
    """Constructor mirroring the reference's `enet(num_classes)` API."""
    if rngs is None:
        rngs = nnx.Rngs(0)
    return ENet(num_classes, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
