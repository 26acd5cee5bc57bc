"""Whole-network W-packed region for ENet.

ENet (models/enet.py; SURVEY.md §2.1 "ENet") spends its encoder and
decoder at /2 and /4 resolution with 16-64 logical channels and 4-16
channel bottleneck mids, so TPU lane tiling pads every one of those
activations to 128 lanes — 2× (64ch) to 32× (4ch mids) of pure HBM
waste, the same pathology `ops/packed_lds.py` removed for FastSCNN's
LearningToDownsample. The packed deconv HEAD (commit history: 70.0 →
80.3 img/s at the zoo tier) fixed only the final full-res logits; the
b32/768² device trace after it is still a flat, fusion+copy-dominated
408 ms/step with XLA auto-remat families active.

This module runs the ENTIRE model in the W-packed `(N, H, W/P, P·C)`
layout — InitialBlock, down/regular/up bottlenecks with max-pool INDEX
FORWARDING in packed form, spatial dropout, and the final transposed
conv emitting `PackedLogits` the loss consumes natively — leaving only
stage2/3 (128 ch at /8, already lane-perfect in NHWC) on the standard
path. Every conv is ONE ordinary `lax.conv_general_dilated` over a
scatter-built structured kernel (`packed_ops.plan_packed_conv/_deconv`),
so there are no Mosaic custom-call layout boundaries; pool/unpool/
concat/channel-pad ride selection/placement MXU matmuls
(`packed_ops.packed_max_pool2x2_indices` etc.); BatchNorm reduces the
identical per-channel statistics through the logical (..., P, C) view
(`packed_lds.packed_batchnorm`, updating the SAME running stats);
spatial dropout draws the identical logical (N, 1, 1, C) mask bits as
`nnx.Dropout` (same key, same shape) and tiles it across the pack.

Pack chain (input W must divide 16): stem input P=16 → /2 P=8 (16ch →
128 lanes), /4 P=4 (64ch → 256), /8 P=2 (128ch → 256, unpacked to NHWC
for stage2/3), then the decoder inverts it via packed deconvs/unpools
back to P=8, and the head deconv emits P=16 packed logits. Wp = W/16 is
CONSTANT through the whole region: no repack relayouts anywhere.

Numerics: identical math to the NHWC path up to float reassociation
(conv tap order, BN reduction order); parity pinned by
tests/test_packed_enet.py. Routing: training mode on TPU by default,
`TPU_SEG_PACKED_ENET_BODY=1/0` (or the global `TPU_SEG_PACKED=0`)
overrides — same contract as the packed head.

Reference counterpart: ordinary cuDNN NCHW convs + max_unpool2d
(SURVEY.md §2.2 "Max-pool w/ indices / max-unpool"); the packed layout
is purely a TPU lane-utilization strategy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from torch_semantic_segmentation_tpu.ops.conv import activation
from torch_semantic_segmentation_tpu.ops.packed_lds import (
    _conv_compute,
    pack,
    packed_batchnorm,
    unpack,
)
from torch_semantic_segmentation_tpu.ops.packed_ops import (
    PackedLogits,
    packed_channel_concat,
    packed_max_pool2x2_indices,
    packed_max_unpool2x2,
    packed_prelu,
    placement_matrix,
    plan_packed_conv,
    plan_packed_deconv,
)

# Pack factor at /2 resolution: 16 ch → exactly one 128-lane tile. The
# whole chain derives from it (stem in 2·P2, /4 P2/2, /8 P2/4).
P2 = 8

_PLANS: dict = {}


def _plan_conv(conv, p_in: int, p_out: int):
    """plan_packed_conv from an nnx.Conv's static config (cached — the
    numpy scatter-index plan is identical across traces)."""
    ks = tuple(conv.kernel_size)
    st = conv.strides if isinstance(conv.strides, tuple) else (conv.strides,) * 2
    dil = (conv.kernel_dilation
           if isinstance(conv.kernel_dilation, tuple)
           else (conv.kernel_dilation,) * 2)
    (ph, _), (pw, _) = conv.padding
    key = ("c", conv.in_features, conv.out_features, ks, st, dil, ph, pw,
           conv.feature_group_count, p_in, p_out)
    if key not in _PLANS:
        _PLANS[key] = plan_packed_conv(
            conv.in_features, conv.out_features, ks, p_in, p_out,
            stride=st, dilation=dil, padding=(ph, pw),
            groups=conv.feature_group_count)
    return _PLANS[key]


def _plan_deconv(dc, p_in: int, p_out: int):
    key = ("d", dc.in_features, dc.out_features, tuple(dc.kernel.shape[:2]),
           dc.stride, dc.padding, dc.output_padding, p_in, p_out)
    if key not in _PLANS:
        _PLANS[key] = plan_packed_deconv(
            dc.in_features, dc.out_features, tuple(dc.kernel.shape[:2]),
            p_in, p_out, stride=dc.stride, padding=dc.padding,
            output_padding=dc.output_padding)
    return _PLANS[key]


def _conv(conv, x: jax.Array, p_in: int, p_out: int) -> jax.Array:
    """nnx.Conv in packed layout (dtype promotion contract preserved)."""
    plan = _plan_conv(conv, p_in, p_out)
    pk = plan.kernel(conv.kernel[...])
    xc, pk = _conv_compute(conv, x, pk)
    y = plan.apply(xc, pk)
    if conv.bias is not None:
        y = y + jnp.tile(conv.bias[...], p_out).astype(y.dtype)
    return y


def _deconv(dc, x: jax.Array, p_in: int, p_out: int) -> jax.Array:
    """ops.conv.ConvTranspose2d in packed layout (its dtype contract:
    cast both to dc.dtype when set, else kernel to x.dtype)."""
    plan = _plan_deconv(dc, p_in, p_out)
    k = dc.kernel[...]
    if dc.dtype is not None:
        x = x.astype(dc.dtype)
        k = k.astype(dc.dtype)
    else:
        k = k.astype(x.dtype)
    y = plan(x, k)
    if dc.bias is not None:
        y = y + jnp.tile(dc.bias[...], p_out).astype(y.dtype)
    return y


def _cba(cba, x: jax.Array, p_in: int, p_out: int) -> jax.Array:
    """ops.conv.ConvBNAct in packed layout: conv plan → packed BN
    (identical stats/running-stat updates) → PReLU/named act."""
    c = cba.conv.out_features
    y = _conv(cba.conv, x, p_in, p_out)
    if cba.bn is not None:
        y = packed_batchnorm(cba.bn, y, c)
    if cba.act is not None:                       # PReLU module
        return packed_prelu(cba.act.alpha[...], y, c)
    return activation(cba._act_name)(y)


def packed_spatial_dropout(drop, x: jax.Array, c: int) -> jax.Array:
    """`Dropout(broadcast_dims=(1, 2))` on a packed tensor: draw the
    LOGICAL (N, 1, 1, C) bernoulli mask — same key consumption, same
    mask bits as the NHWC path (ops/dropout.py defers to nnx.Dropout
    below its size floor, and these masks are tiny) — then tile it
    across the pack so every W position of a channel drops together."""
    det = drop.deterministic
    if drop.rate == 0.0 or det:
        return x
    if drop.rate == 1.0:
        return jnp.zeros_like(x)
    from flax import nnx
    if isinstance(drop.rngs, nnx.Rngs):
        key = drop.rngs[drop.rng_collection]()
    elif isinstance(drop.rngs, nnx.RngStream):
        key = drop.rngs()
    else:                                         # jax.Array key
        key = drop.rngs
    keep = 1.0 - drop.rate
    p = x.shape[-1] // c
    mask = jax.random.bernoulli(key, p=keep, shape=(x.shape[0], 1, 1, c))
    mask = jnp.broadcast_to(jnp.tile(mask, (1, 1, 1, p)), x.shape)
    return jax.lax.select(mask, x / keep, jnp.zeros_like(x))


def initial_forward(blk, x: jax.Array, p_out: int) -> jax.Array:
    """models.enet.InitialBlock: s2 conv ∥ 2×2 max-pool, concat, BN,
    PReLU — input packed at 2·p_out straight off plain NHWC."""
    conv = blk.conv
    xp = pack(x, 2 * p_out)
    y = _conv(conv, xp, 2 * p_out, p_out)
    pool, _ = packed_max_pool2x2_indices(xp, conv.in_features)
    c_out = conv.out_features + conv.in_features
    y = packed_channel_concat(
        [(y, conv.out_features), (pool.astype(y.dtype), conv.in_features)],
        p_out)
    y = packed_batchnorm(blk.bn, y, c_out)
    return packed_prelu(blk.act.alpha[...], y, c_out)


def bottleneck_forward(blk, x: jax.Array, p: int, indices=None):
    """models.enet.Bottleneck in packed layout. Mirrors its __call__
    branch-for-branch; 'down' returns (out, packed idx) and 'up'
    consumes the encoder's packed idx (cross-tensor index forwarding
    stays in packed form end to end)."""
    kind = blk.kind
    pm = p // 2 if kind == "down" else p
    y = _cba(blk.proj, x, p, pm)
    if kind == "asymmetric":
        y = _cba(blk.mid_b, _cba(blk.mid_a, y, pm, pm), pm, pm)
    elif kind == "up":
        cm = blk.mid_deconv.out_features
        y = _deconv(blk.mid_deconv, y, pm, 2 * pm)
        y = packed_batchnorm(blk.mid_bn, y, cm)
        y = packed_prelu(blk.mid_act.alpha[...], y, cm)
        pm = 2 * pm
    else:
        y = _cba(blk.mid, y, pm, pm)
    y = _cba(blk.expand, y, pm, pm)
    y = packed_spatial_dropout(blk.dropout, y, blk.out_ch)

    if kind == "down":
        skip, idx = packed_max_pool2x2_indices(x, blk.in_ch)
        if blk.out_ch > blk.in_ch:
            mat = jnp.asarray(
                placement_matrix(blk.in_ch, blk.out_ch, 0, pm), skip.dtype)
            skip = skip @ mat
        out = y + skip.astype(y.dtype)
        return packed_prelu(blk.out_act.alpha[...], out, blk.out_ch), idx
    if kind == "up":
        assert indices is not None, "up-bottleneck needs encoder pool indices"
        s = _cba(blk.skip_conv, x, p, p)
        s = packed_max_unpool2x2(s, indices, blk.out_ch)
        out = y + s.astype(y.dtype)
        return packed_prelu(blk.out_act.alpha[...], out, blk.out_ch)
    out = y + x.astype(y.dtype)
    return packed_prelu(blk.out_act.alpha[...], out, blk.out_ch)


def supports(model, x_shape: tuple) -> bool:
    """W must divide the stem input pack (2·P2 = 16; Wp is constant down
    the chain so every later layer's divisibility follows), and the
    packed head's lane row must stay within one reasonable tile burst."""
    return x_shape[2] % (2 * P2) == 0 and model.fullconv.out_features * 2 * P2 <= 1280


def forward(model, x: jax.Array) -> PackedLogits:
    """Packed forward of models.enet.ENet: encoder and decoder in the
    W-packed layout, stage2/3 (128 ch at /8 — lane-perfect in NHWC) on
    the standard blocks, output as PackedLogits for the packed loss."""
    y = initial_forward(model.initial, x, P2)            # /2, P=8, 16ch
    y, idx1 = bottleneck_forward(model.down1, y, P2)     # /4, P=4, 64ch
    for blk in model.stage1:
        y = bottleneck_forward(blk, y, P2 // 2)
    y, idx2 = bottleneck_forward(model.down2, y, P2 // 2)  # /8, P=2, 128ch
    c8 = model.down2.out_ch
    y = unpack(y, c8)                                    # NHWC for stage2/3
    for blk in model.stage2:
        y = blk(y)
    for blk in model.stage3:
        y = blk(y)
    y = pack(y, P2 // 4)
    y = bottleneck_forward(model.up4, y, P2 // 4, indices=idx2)  # /4, P=4
    for blk in model.stage4:
        y = bottleneck_forward(blk, y, P2 // 2)
    y = bottleneck_forward(model.up5, y, P2 // 2, indices=idx1)  # /2, P=8
    for blk in model.stage5:
        y = bottleneck_forward(blk, y, P2)
    y = _deconv(model.fullconv, y, P2, 2 * P2)           # full res, P=16
    return PackedLogits(y, model.fullconv.out_features)
