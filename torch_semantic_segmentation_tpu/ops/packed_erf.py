"""Whole-network W-packed region for the ERFNet family (ERFNet, ESNet).

Both models (models/erfnet.py, models/esnet.py; SURVEY.md §2.1 stretch
rows) spend their encoders and decoders at /2 (16 ch) and /4 (64 ch)
resolution, so TPU lane tiling pads those activations 8× / 2× — the
same pathology `ops/packed_enet.py` removed for ENet (80.2 → 135.6
img/s at the zoo tier). The packed deconv HEAD alone already bought
erfnet 64.6 → 73.7 and esnet 46.7 → 52.4; this module extends the
packed `(N, H, W/P, P·C)` layout to the WHOLE network, leaving only the
/8 stage (128 ch — lane-perfect in NHWC: the dilated NonBottleneck1d /
PFCU trunk) on the standard blocks.

Because the two models share one block vocabulary (DownsamplerBlock /
UpsamplerBlock / factorized residual units), a single structure-driven
walker covers both: a block runs packed iff any activation it touches
has fewer than 128 logical channels. Pack chain: input P=16 → /2 P=8
(16 ch → exactly 128 lanes) → /4 P=4 (64 ch → 256) → /8 P=2 (128 ch,
unpacked to NHWC for the dilated trunk), inverted by the decoder's
packed deconvs back to P=8, and the output deconv emits P=16
`PackedLogits` the loss consumes natively. Wp = W/16 is CONSTANT down
the chain: no repack relayouts anywhere.

Every conv is ONE ordinary `lax.conv_general_dilated` over a
scatter-built structured kernel (`packed_ops.plan_packed_conv/_deconv`
via the `packed_enet` helpers); max-pool rides selection matmuls; BN
reduces identical per-channel statistics through the logical (..., P,
C) view and updates the SAME running stats. Per-element dropout needs
NO special handling: `pack` is a pure reshape, so a THREEFRY mask drawn
in the packed shape has the identical raveled bit order as the NHWC
draw — same key, same logical mask (pinned by tests/test_packed_erf.py,
which runs the threefry path). On TPU the default hardware-RNG dropout
(ops/dropout.py) is shape-dependent, so packed-layout draws differ
bitwise from NHWC draws — equivalent in distribution, not identical.

Routing: training mode on TPU by default; `TPU_SEG_PACKED_ERFNET_BODY`
/ `TPU_SEG_PACKED_ESNET_BODY` (or the global `TPU_SEG_PACKED=0`)
override — the same contract as the ENet body.

Reference counterpart: ordinary cuDNN NCHW convs (SURVEY.md §2.2 conv
rows); the packed layout is purely a TPU lane-utilization strategy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from torch_semantic_segmentation_tpu.ops.packed_enet import _conv, _deconv
from torch_semantic_segmentation_tpu.ops.packed_lds import (
    pack,
    packed_batchnorm,
    unpack,
)
from torch_semantic_segmentation_tpu.ops.packed_ops import (
    PackedLogits,
    packed_channel_concat,
    packed_max_pool2x2_indices,
)

# Pack factor at /2 resolution: 16 ch → exactly one 128-lane tile.
P2 = 8
# Logical channel count at which NHWC is already lane-perfect: the /8
# trunk (128 ch dilated blocks) runs on the standard block path.
UNPACK_C = 128


def downsampler_forward(blk, x: jax.Array, p_in: int) -> jax.Array:
    """models.erfnet.DownsamplerBlock: s2 conv ∥ 2×2 max-pool, concat,
    BN, ReLU — ENet-InitialBlock-shaped, plain-ReLU variant."""
    c_in = blk.conv.in_features
    c_conv = blk.conv.out_features
    p_out = p_in // 2
    y = _conv(blk.conv, x, p_in, p_out)
    pool, _ = packed_max_pool2x2_indices(x, c_in)   # idx unused → DCE'd
    y = packed_channel_concat(
        [(y, c_conv), (pool.astype(y.dtype), c_in)], p_out)
    y = packed_batchnorm(blk.bn, y, c_in + c_conv)
    return jax.nn.relu(y)


def upsampler_forward(blk, x: jax.Array, p_in: int) -> jax.Array:
    """models.erfnet.UpsamplerBlock: k3/s2 deconv, BN, ReLU."""
    y = _deconv(blk.conv, x, p_in, 2 * p_in)
    y = packed_batchnorm(blk.bn, y, blk.conv.out_features)
    return jax.nn.relu(y)


def _factorized_forward(convs, bns, dropout, x: jax.Array, p: int,
                        c: int) -> jax.Array:
    """Shared body of NonBottleneck1d and FCU: two (K×1 → 1×K) pairs,
    BN after each pair, dropout, residual. `convs` = (a1, a2, b1, b2).
    Mirrors the NHWC __call__ op-for-op (same dtype promotion, same RNG
    key consumption; on the threefry path the packed dropout mask is
    the identical logical mask — `pack` is a reshape, so the raveled
    draw order matches; TPU rbg masks are shape-dependent and match in
    distribution only — see module docstring)."""
    a1, a2, b1, b2 = convs
    bn1, bn2 = bns
    y = jax.nn.relu(_conv(a1, x, p, p))
    y = jax.nn.relu(packed_batchnorm(bn1, _conv(a2, y, p, p), c))
    y = jax.nn.relu(_conv(b1, y, p, p))
    y = packed_batchnorm(bn2, _conv(b2, y, p, p), c)
    y = dropout(y)
    return jax.nn.relu(y + x)


def _block_io_ch(blk) -> tuple[int, int]:
    """(logical in-channels, logical out-channels) of a zoo block."""
    from torch_semantic_segmentation_tpu.models.erfnet import (
        DownsamplerBlock, NonBottleneck1d, UpsamplerBlock)
    from torch_semantic_segmentation_tpu.models.esnet import FCU, PFCU

    if isinstance(blk, DownsamplerBlock):
        c_in = blk.conv.in_features
        return c_in, c_in + blk.conv.out_features
    if isinstance(blk, UpsamplerBlock):
        return blk.conv.in_features, blk.conv.out_features
    if isinstance(blk, NonBottleneck1d):
        c = blk.conv3x1_1.in_features
        return c, c
    if isinstance(blk, FCU):
        c = blk.conv_a1.in_features
        return c, c
    if isinstance(blk, PFCU):
        c = blk.stem1.in_features
        return c, c
    raise TypeError(f"unknown ERFNet-family block: {type(blk).__name__}")


def _block_packed(blk, y: jax.Array, p: int) -> tuple[jax.Array, int]:
    """One block in packed layout → (output, output pack factor)."""
    from torch_semantic_segmentation_tpu.models.erfnet import (
        DownsamplerBlock, NonBottleneck1d, UpsamplerBlock)
    from torch_semantic_segmentation_tpu.models.esnet import FCU

    if isinstance(blk, DownsamplerBlock):
        return downsampler_forward(blk, y, p), p // 2
    if isinstance(blk, UpsamplerBlock):
        return upsampler_forward(blk, y, p), 2 * p
    if isinstance(blk, NonBottleneck1d):
        c = blk.conv3x1_1.in_features
        convs = (blk.conv3x1_1, blk.conv1x3_1, blk.conv3x1_2, blk.conv1x3_2)
        return _factorized_forward(
            convs, (blk.bn1, blk.bn2), blk.dropout, y, p, c), p
    if isinstance(blk, FCU):
        c = blk.conv_a1.in_features
        convs = (blk.conv_a1, blk.conv_a2, blk.conv_b1, blk.conv_b2)
        return _factorized_forward(
            convs, (blk.bn1, blk.bn2), blk.dropout, y, p, c), p
    raise TypeError(f"no packed form for block: {type(blk).__name__}")


def supports(model, x_shape: tuple) -> bool:
    """W must divide the stem input pack (2·P2 = 16; Wp is constant down
    the chain, so every later layer's divisibility follows), the packed
    head's lane row must stay within one reasonable tile burst, and
    every block must be in the walker's vocabulary — a model variant
    with an unrecognized block type (or a <128-ch block with no packed
    form, e.g. a narrow PFCU) falls back to the standard path instead
    of raising mid-forward."""
    from torch_semantic_segmentation_tpu.models.erfnet import (
        DownsamplerBlock, NonBottleneck1d, UpsamplerBlock)
    from torch_semantic_segmentation_tpu.models.esnet import FCU, PFCU

    known = (DownsamplerBlock, UpsamplerBlock, NonBottleneck1d, FCU, PFCU)
    packed_ok = (DownsamplerBlock, UpsamplerBlock, NonBottleneck1d, FCU)
    for blk in list(model.encoder) + list(model.decoder):
        if not isinstance(blk, known):
            return False
        c_in, c_out = _block_io_ch(blk)
        if min(c_in, c_out) < UNPACK_C and not isinstance(blk, packed_ok):
            return False
    return (x_shape[2] % (2 * P2) == 0
            and model.output_conv.out_features * 2 * P2 <= 1280)


def forward(model, x: jax.Array) -> PackedLogits:
    """Packed forward shared by ERFNet and ESNet: walk the encoder +
    decoder block lists, running every block that touches a <128-channel
    activation in the W-packed layout and the 128-ch /8 trunk (dilated
    NonBottleneck1d / PFCU — lane-perfect NHWC) on the standard path;
    the output deconv emits PackedLogits for the packed loss."""
    p = 2 * P2
    y = pack(x, p)
    packed = True
    for blk in list(model.encoder) + list(model.decoder):
        c_in, c_out = _block_io_ch(blk)
        want = min(c_in, c_out) < UNPACK_C
        if want and not packed:
            y = pack(y, p)           # resolution unchanged in the trunk
            packed = True
        elif not want and packed:
            y = unpack(y, c_in)
            packed = False
        if packed:
            y, p = _block_packed(blk, y, p)
        else:
            y = blk(y)
    head = model.output_conv
    y = _deconv(head, y, p, 2 * p)   # full res, P=16
    return PackedLogits(y, head.out_features)
