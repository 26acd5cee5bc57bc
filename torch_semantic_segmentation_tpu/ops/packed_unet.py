"""Full-resolution W-packed region for UNet (VERDICT r3 next #3).

UNet (models/unet.py; SURVEY.md §2.1 "UNet", BASELINE.json config 3) is
the zoo's worst throughput row (32.9 img/s at 768², b8): its symmetric
decoder returns to FULL resolution at base_ch=64 — enc1's two 3×3 convs,
up1's k2/s2 deconv + skip concat + two 3×3 convs, and the 1×1 head all
touch full-res tensors whose 64-channel minor dim TPU tiling pads to 128
lanes (2× pure HBM waste on the hottest tensors in the network), and the
19-channel logits pad 6.7×. Same pathology `ops/packed_enet.py` removed
for ENet (+69% measured).

This module runs exactly that full-res rim in the W-packed
`(N, H, W/2, 2·C)` layout — at P=2 the base-64 stage is ONE 128-lane
tile, and the 2×2 max-pool after enc1 *naturally exits* the packed
layout (pool halves the pack: P=2 → P=1 ≡ plain NHWC), so the entire
1/2-res-and-below pyramid (all ≥128 ch — already lane-perfect) runs the
standard blocks with zero repacks. The decoder re-enters packed form
through up1's deconv (`plan_packed_deconv` p_in=1 accepts the plain 1/2-
res input and emits packed full-res), the skip concat rides a placement
matmul against the still-packed enc1 output, and the head repacks
2 → `pick_head_pack` (32/64: 95% lane utilization) for a block-diagonal
1×1 conv emitting `PackedLogits` the loss consumes natively — the
6.7×-padded full-res logits tensor never exists.

Every conv is ONE ordinary `lax.conv_general_dilated` over a
scatter-built structured kernel (no Mosaic custom calls — autodiff flows
through the scatter); BatchNorm reduces identical per-channel statistics
through the logical (..., P, C) view and updates the SAME running stats.
Numerics: identical math to the NHWC path up to float reassociation
(tests/test_packed_unet.py pins forward, gradients, and BN stats).

Routing: training mode on TPU by default; `TPU_SEG_PACKED_UNET_BODY=1/0`
(or the global `TPU_SEG_PACKED=0`) overrides — the same contract as the
ENet/ERFNet bodies. The `upsample="bilinear"` variant keeps the standard
path (its fused Pallas upsample+concat kernel is the designed route).

Reference counterpart: ordinary cuDNN NCHW convs + ConvTranspose2d
(SURVEY.md §2.2 "Transposed conv" / "Bilinear upsample" rows); the
packed layout is purely a TPU lane-utilization strategy.
"""

from __future__ import annotations

import jax

from torch_semantic_segmentation_tpu.ops.packed_enet import _cba, _conv, _deconv
from torch_semantic_segmentation_tpu.ops.packed_lds import pack, repack
from torch_semantic_segmentation_tpu.ops.packed_ops import (
    PackedLogits,
    packed_channel_concat,
    packed_max_pool2x2_indices,
    pick_head_pack,
)

# Full-res pack factor: base_ch 64 → exactly one 128-lane tile, and the
# 2×2 pool after enc1 exits to P=1 ≡ plain NHWC with no repack.
P1 = 2


def supports(model, x_shape: tuple) -> bool:
    """Deconv-decoder variant only (the bilinear variant routes the
    fused Pallas upsample+concat kernel instead); W must divide the
    full-res pack and a head pack must fit the logit width. H/W % 16
    is already asserted by the model itself."""
    return (model.up1.upsample == "deconv"
            and x_shape[2] % (2 * P1) == 0
            and pick_head_pack(model.head.out_features, x_shape[2], 1)
            is not None)


def forward(model, x: jax.Array) -> PackedLogits:
    """Packed forward of models.unet.UNet: the full-res rim (enc1, up1,
    head) in W-packed layout, everything at 1/2 res and below on the
    standard blocks."""
    from torch_semantic_segmentation_tpu.ops import max_pool2d

    b = model.enc1.conv2.conv.out_features          # base_ch
    xp = pack(x, P1)
    s1 = _cba(model.enc1.conv2, _cba(model.enc1.conv1, xp, P1, P1), P1, P1)
    y, _ = packed_max_pool2x2_indices(s1, b)        # P=1 ≡ plain NHWC
    s2 = model.enc2(y)
    s3 = model.enc3(max_pool2d(s2, 2))
    s4 = model.enc4(max_pool2d(s3, 2))
    y = model.bottom(max_pool2d(s4, 2))
    y = model.up4(y, s4)
    y = model.up3(y, s3)
    y = model.up2(y, s2)                            # (N, H/2, W/2, 2b)
    # up1 re-enters the packed layout: plain-input deconv → packed out
    up = model.up1
    y = _deconv(up.up, y, 1, P1)                    # (N, H, W/2, P1·b)
    y = packed_channel_concat([(y, b), (s1.astype(y.dtype), b)], P1)
    y = _cba(up.conv.conv1, y, P1, P1)
    y = _cba(up.conv.conv2, y, P1, P1)
    # head: repack to the widest lane-clean pack, block-diagonal 1×1
    head = model.head
    hp = pick_head_pack(head.out_features, x.shape[2], 1)
    y = repack(y, b, hp)
    y = _conv(head, y, hp, hp)
    return PackedLogits(y, head.out_features)
