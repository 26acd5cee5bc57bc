"""UNet — classic symmetric encoder–decoder with skip concatenations.

Architecture per Ronneberger et al. 2015 (arXiv:1505.04597) with same-padded
convs + BatchNorm (the modern variant the reference zoo ships — SURVEY.md
§2.1 "UNet"; reference file could not be cited, mount empty).

Capability contract (BASELINE.json config 3): UNet with transposed-conv
decoder on CamVid — the model exercising the upsample+concat skip fusion
(the designated Pallas kernel target, SURVEY.md §2.2 "Bilinear upsample").

TPU-native: NHWC; the decoder's transposed conv is the lhs-dilated MXU conv
from ops/conv.py; the skip concat feeds straight into the double-conv so XLA
fuses pad+concat into the conv's input. `upsample="bilinear"` swaps the
deconv for the MXU-matmul bilinear resize + 1×1 conv (a common reference
variant; also the fused-kernel path).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx

from torch_semantic_segmentation_tpu.ops import (
    ConvBNAct,
    ConvTranspose2d,
    make_conv,
    max_pool2d,
    resize_bilinear,
    upsample2x_concat,
)


class DoubleConv(nnx.Module):
    """(conv3×3 → BN → ReLU) ×2 — UNet's basic stage."""

    def __init__(self, in_ch: int, out_ch: int, *, dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.conv1 = ConvBNAct(in_ch, out_ch, 3, act="relu", **kw)
        self.conv2 = ConvBNAct(out_ch, out_ch, 3, act="relu", **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.conv2(self.conv1(x))


class UpBlock(nnx.Module):
    """Upsample ×2 (deconv or bilinear+1×1), concat skip, double conv.

    The bilinear variant runs the 1×1 conv at LOW resolution (1×1 conv and
    bilinear resize commute exactly — both are linear), then uses the fused
    Pallas upsample+concat kernel (`ops.upsample2x_concat`): the upsampled
    map never round-trips HBM before the concat (BASELINE north_star
    "upsample+concat skip fusion").
    """

    def __init__(self, in_ch: int, skip_ch: int, out_ch: int, *,
                 upsample: str = "deconv", align_corners: bool = False,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.upsample = upsample
        self.align_corners = align_corners
        if upsample == "deconv":
            self.up = ConvTranspose2d(in_ch, out_ch, 2, stride=2, **kw)
        else:
            self.up = make_conv(in_ch, out_ch, 1, use_bias=True, **kw)
        self.conv = DoubleConv(out_ch + skip_ch, out_ch, **kw)

    def __call__(self, x: jax.Array, skip: jax.Array) -> jax.Array:
        if self.upsample == "deconv":
            x = self.up(x)
            return self.conv(jnp.concatenate([x, skip], axis=-1))
        x = self.up(x)                      # 1×1 at low res, then fused up+cat
        if self.align_corners:              # kernel implements AC=False only
            x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2),
                                align_corners=True)
            return self.conv(jnp.concatenate([x, skip], axis=-1))
        return self.conv(upsample2x_concat(x, skip))


class UNet(nnx.Module):
    """UNet (Ronneberger 2015). Input NHWC float; H, W % 16 == 0.

    Channel plan: base·(1,2,4,8,16) encoder; symmetric decoder; full-res
    (N, H, W, num_classes) logits.
    """

    def __init__(self, num_classes: int = 19, in_ch: int = 3, *,
                 base_ch: int = 64, upsample: str = "deconv", dtype=None,
                 param_dtype=jnp.float32, rngs: nnx.Rngs):
        kw: tp.Any = dict(dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        # Explicit train/eval flag (packed-body routing contract,
        # packed_ops.module_train_mode): nnx train()/eval() flips
        # this plain bool together with every BatchNorm/Dropout.
        self.use_running_average = False
        b = base_ch
        self.enc1 = DoubleConv(in_ch, b, **kw)
        self.enc2 = DoubleConv(b, 2 * b, **kw)
        self.enc3 = DoubleConv(2 * b, 4 * b, **kw)
        self.enc4 = DoubleConv(4 * b, 8 * b, **kw)
        self.bottom = DoubleConv(8 * b, 16 * b, **kw)
        up: tp.Any = dict(upsample=upsample, **kw)
        self.up4 = UpBlock(16 * b, 8 * b, 8 * b, **up)
        self.up3 = UpBlock(8 * b, 4 * b, 4 * b, **up)
        self.up2 = UpBlock(4 * b, 2 * b, 2 * b, **up)
        self.up1 = UpBlock(2 * b, b, b, **up)
        self.head = make_conv(b, num_classes, 1, use_bias=True, **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = x.shape[1], x.shape[2]
        if h % 16 or w % 16:
            raise ValueError(
                f"UNet needs H and W divisible by 16 (4 pooling stages); "
                f"got {h}x{w}")
        if self._route_packed_body(x):
            from torch_semantic_segmentation_tpu.ops import packed_unet

            return packed_unet.forward(self, x)
        s1 = self.enc1(x)
        s2 = self.enc2(max_pool2d(s1, 2))
        s3 = self.enc3(max_pool2d(s2, 2))
        s4 = self.enc4(max_pool2d(s3, 2))
        y = self.bottom(max_pool2d(s4, 2))
        y = self.up4(y, s4)
        y = self.up3(y, s3)
        y = self.up2(y, s2)
        y = self.up1(y, s1)
        return self.head(y)

    def _route_packed_body(self, x: jax.Array) -> bool:
        """Full-res W-packed rim (ops/packed_unet.py): enc1/up1/head in
        `(N, H, W/2, 2·C)` layout, PackedLogits out. Training mode on
        TPU by default; TPU_SEG_PACKED_UNET_BODY overrides — same
        contract as the ENet/ERFNet packed bodies."""
        from torch_semantic_segmentation_tpu.ops import packed_ops, packed_unet

        if not packed_ops.route_packed_head(
                "TPU_SEG_PACKED_UNET_BODY",
                packed_ops.module_train_mode(self)):
            return False
        return packed_unet.supports(self, x.shape)


def unet(num_classes: int = 19, *, base_ch: int = 64, upsample: str = "deconv",
         dtype=None, param_dtype=jnp.float32,
         rngs: nnx.Rngs | None = None) -> UNet:
    """Constructor mirroring the reference's `unet(num_classes)` API."""
    if rngs is None:
        rngs = nnx.Rngs(0)
    return UNet(num_classes, base_ch=base_ch, upsample=upsample, dtype=dtype,
                param_dtype=param_dtype, rngs=rngs)
