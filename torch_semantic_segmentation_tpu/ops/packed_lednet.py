"""Whole-encoder W-packed region for LEDNet (round 5).

LEDNet (models/lednet.py; SURVEY.md §2.1 stretch row) was the last
sub-100 zoo row (52.9 img/s b8 768²) after the round-5 structured-build
wins, and its per-HLO attribution (scripts/diag_hlo_attr.py) shows why:
0.87 TFLOP/step against 129 GB of compiled bytes — pure bandwidth-bound
— with every hot fusion at ~86 GB/s of the 819 GB/s peak because the
SS-nbt split halves run 16-channel tensors at /2 resolution (8× lane
padding), 32-channel at /4 (4×), 64-channel at /8 (2×). Same pathology
the ENet/ERFNet/ESNet packed bodies remove.

This module runs the ENTIRE encoder in the W-packed `(N, H, W/P, P·C)`
layout: input P=16 → /2 P=8 (32 ch → 256 lanes) → /4 P=4 → /8 P=2,
unpacking once before the APN head (which operates at 128 ch and
C=num_classes on small /8..∕64 grids — lane-clean enough to stay on the
standard path). The SS-nbt block's channel split and ShuffleNet channel
shuffle become 0/1 SELECTION MATMULS on the MXU (`placement_matrix`
transposes and a per-pack shuffle permutation — the idle-MXU trick the
packed pool already uses) instead of strided lane slices, which would
relayout; the factorized (3×1)/(1×3) convs (incl. dilations up to 17)
ride `plan_packed_conv` structured kernels; BN reduces identical
per-channel statistics through the logical view; per-element dropout
applies directly to the packed tensor (`pack` is a reshape — threefry
masks are bit-identical to NHWC, hw-RNG masks equal in distribution,
the same contract as ops/packed_erf.py).

Measured (2026-08-20 v5lite, zoo tier b8 768², same-day pair):
52.3 → 157.4 img/s (+201%; b16 148.2 / b32 128.7 — b8 stays the
preferred batch); default ON (TPU_SEG_PACKED_LEDNET_BODY=0 opts out).
Numerics: identical math to the NHWC path up to float reassociation
(tests/test_packed_lednet.py pins f64 forward, gradients and BN
running stats).

Reference counterpart: ordinary cuDNN NCHW convs + torch channel_shuffle
(SURVEY.md §2.2 conv rows); the packed layout is purely a TPU
lane-utilization strategy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from torch_semantic_segmentation_tpu.ops.packed_enet import _conv
from torch_semantic_segmentation_tpu.ops.packed_erf import downsampler_forward
from torch_semantic_segmentation_tpu.ops.packed_lds import (
    pack,
    packed_batchnorm,
    unpack,
)
from torch_semantic_segmentation_tpu.ops.packed_ops import (
    packed_channel_concat,
    placement_matrix,
)

# Input pack factor: /2 after the first downsampler is P=8 (32 ch → 256
# lanes), /4 P=4, /8 P=2 — Wp = W/16 constant down the whole encoder.
P_IN = 16

_MATS: dict = {}


def _split_mats(c: int, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Extraction matrices (p·c, p·c∕2) for the SS-nbt channel split:
    the transposes of `placement_matrix` (a strided lane slice as one
    MXU matmul)."""
    key = ("split", c, p)
    if key not in _MATS:
        half = c // 2
        _MATS[key] = (
            np.ascontiguousarray(placement_matrix(half, c, 0, p).T),
            np.ascontiguousarray(placement_matrix(half, c, half, p).T),
        )
    return _MATS[key]


def _shuffle_mat(c: int, p: int, groups: int = 2) -> np.ndarray:
    """(p·c, p·c) per-pack permutation of the ShuffleNet channel
    shuffle (models.lednet.channel_shuffle: out[j·g + gi] = in[gi·(c∕g)
    + j])."""
    key = ("shuffle", c, p, groups)
    if key not in _MATS:
        cg = c // groups
        m = np.zeros((p * c, p * c), np.float32)
        for q in range(p):
            for gi in range(groups):
                for j in range(cg):
                    m[q * c + gi * cg + j, q * c + j * groups + gi] = 1.0
        _MATS[key] = m
    return _MATS[key]


def _branch(convs, bn1, bn2, x: jax.Array, p: int, c: int, *,
            transposed: bool) -> jax.Array:
    """One SS-nbt branch in packed layout — mirrors SSnbt._run
    op-for-op (same conv order, same BN placement, same dtype
    promotion)."""
    c1, c2, c3, c4 = convs
    order = (c2, c1, c4, c3) if transposed else (c1, c2, c3, c4)
    y = jax.nn.relu(_conv(order[0], x, p, p))
    y = jax.nn.relu(packed_batchnorm(bn1, _conv(order[1], y, p, p), c))
    y = jax.nn.relu(_conv(order[2], y, p, p))
    return packed_batchnorm(bn2, _conv(order[3], y, p, p), c)


def ssnbt_forward(blk, x: jax.Array, p: int, c: int) -> jax.Array:
    """models.lednet.SSnbt in packed layout: split → two factorized
    branches → concat → dropout → residual ReLU → channel shuffle, with
    split and shuffle as selection matmuls."""
    half = c // 2
    sl, sr = _split_mats(c, p)
    xl = x @ jnp.asarray(sl, x.dtype)
    xr = x @ jnp.asarray(sr, x.dtype)
    yl = _branch(tuple(blk.left), blk.bn_left1, blk.bn_left2, xl, p, half,
                 transposed=False)
    yr = _branch(tuple(blk.right), blk.bn_right1, blk.bn_right2, xr, p, half,
                 transposed=True)
    y = packed_channel_concat([(yl, half), (yr.astype(yl.dtype), half)], p)
    y = blk.dropout(y)
    y = jax.nn.relu(y + x)
    return y @ jnp.asarray(_shuffle_mat(c, p), y.dtype)


def supports(model, x_shape: tuple) -> bool:
    """Every encoder block must be in the walker's vocabulary
    (DownsamplerBlock / SSnbt) and W must divide the input pack; the
    H/W % 16 model guard already holds."""
    from torch_semantic_segmentation_tpu.models.erfnet import DownsamplerBlock
    from torch_semantic_segmentation_tpu.models.lednet import SSnbt

    for blk in model.encoder:
        if not isinstance(blk, (DownsamplerBlock, SSnbt)):
            return False
    return x_shape[2] % P_IN == 0


def encoder_forward(model, x: jax.Array) -> jax.Array:
    """Packed walk of the LEDNet encoder; returns the /8 feature map in
    plain NHWC for the APN head."""
    from torch_semantic_segmentation_tpu.models.erfnet import DownsamplerBlock

    p = P_IN
    y = pack(x, p)
    c = x.shape[-1]
    for blk in model.encoder:
        if isinstance(blk, DownsamplerBlock):
            y = downsampler_forward(blk, y, p)
            c = blk.conv.in_features + blk.conv.out_features
            p //= 2
        else:
            y = ssnbt_forward(blk, y, p, c)
    return unpack(y, c)
