"""Whole-LDS W-packed layout region (VERDICT r2 next #1a).

The full-res roofline study (docs/FULLRES_ROOFLINE.md) attributes 46% of
the FastSCNN 1024×2048 train step to the LearningToDownsample region,
whose small channel counts (3/32/48/64) make XLA pad the minor (lane)
dimension up to 128/C× on every tensor — logical 71 GB of HBM traffic at
b32 vs a ~10 GB minimum. Round 2's Pallas depthwise kernels fixed the
layout locally but lost model-level to ~GB-scale relayout copies XLA
inserts around Mosaic custom calls (default-layout operands).

This module removes the padding WITHOUT custom calls: activations live in
a W-packed layout `(N, H, W/P, P·C)` (a pure reshape of NHWC — P
consecutive W positions' channel vectors concatenated along the minor
dim, sized to fill 128-lane tiles), and every LDS conv becomes ONE
ordinary `lax.conv_general_dilated` in that layout:

- A stride-2 k=3 conv (stem 3→32 and both depthwise 3×3) maps to a
  (kh=3, kw=2) window over (H, W/P) with strides (2, 1) and padding
  ((1,1), (1,0)): output pack j depends only on input packs {j-1, j}
  (P_in = 2·P_out), and the in-pack tap arithmetic is absorbed into a
  structured kernel `PK[ht, d, P_in·C_in, P_out·C_out]` scatter-built
  from the real 3×3 weights (autodiff flows through the scatter, so the
  backward pass is the standard conv VJP plus a cheap gather).
- The 1×1 pointwise convs become block-diagonal matmuls (P identical
  C_in×C_out blocks) at P× FLOP waste — idle-MXU FLOPs traded for the
  lane padding's HBM bytes, the winning trade in a bandwidth-bound
  region.
- BatchNorm reduces per-channel stats through a logical (..., P, C) view
  (identical statistics to NHWC BN — flax's own `_compute_stats` on the
  view) and normalizes in packed layout with P-tiled parameters,
  updating the SAME `nnx.BatchNorm` running stats as the standard path.

Everything is plain XLA (convs, reshapes, elementwise): no Mosaic layout
boundaries, and XLA lays the packed convs out like any other MXU conv.

Numerics: identical math to the NHWC path up to float reassociation
(conv tap/accumulation order differs); parity is pinned by
tests/test_packed_lds.py at fp32 and the routed model path keeps the
standard graph reachable via FASTSCNN_PACKED_LDS/`packed_lds=False`.
"""

from __future__ import annotations

import os
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax.nnx.nn import normalization as _fnorm

# One chain parameter p1 derives every pack factor: stem (2·p1 → p1),
# ds1 dw (p1 → p1/2), ds1 pw (p1/2), ds2 dw (p1/2 → p1/4), ds2 pw (p1/4)
# — P_in = 2·P_out is forced by each layer's W-stride of 2, and chaining
# them consistently means NO repack reshapes between layers (HLO showed
# each repack boundary costs a real relayout copy AND doubles that
# activation's fwd+bwd read/write lifecycle). With p1=8 the packed W
# count is CONSTANT (W/16) through the whole region and lane widths are
# 48 (stem in, padded to 128), 256, 128, 192, 192, 96 (padded), 128.
DEFAULT_P1 = 8


def chain_packs(p1: int | None = None) -> tuple:
    if p1 is None:
        p1 = int(os.environ.get("FASTSCNN_PACKED_P1", DEFAULT_P1))
    if p1 % 4:
        raise ValueError(f"p1 must be a multiple of 4, got {p1}")
    return (2 * p1, p1), (p1, p1 // 2), (p1 // 2, p1 // 4)


def pack(x: jax.Array, p: int) -> jax.Array:
    """NHWC → (N, H, W/P, P·C). Pure reshape (contiguous)."""
    n, h, w, c = x.shape
    if w % p:
        raise ValueError(f"W={w} not divisible by pack {p}")
    return x.reshape(n, h, w // p, p * c)


def unpack(x: jax.Array, c: int) -> jax.Array:
    """(N, H, Wp, P·C) → NHWC."""
    n, h, wp, pc = x.shape
    return x.reshape(n, h, wp * (pc // c), c)


def repack(x: jax.Array, c: int, p: int) -> jax.Array:
    n, h, wp, pc = x.shape
    return pack(x.reshape(n, h, wp * (pc // c), c), p)


def _structured() -> bool:
    """Round 5: packed kernels are assembled by static-slice slab
    placement by default. The original flat gather + scatter-add lowers
    on TPU to s32 index-unpack + gather/scatter pairs in a [n,1] layout
    (1 of 128 lanes — measured ~1-3 ms per build site per step,
    scripts/diag_hlo_attr.py); the static form lowers to pad/add
    fusions. TPU_SEG_STRUCTURED_KERNEL_BUILD=0 restores the old path
    for A/Bs."""
    import os

    return os.environ.get("TPU_SEG_STRUCTURED_KERNEL_BUILD", "1") != "0"


def _scatter_kernel(k: jax.Array, c_in: int, c_out: int, p_out: int,
                    depthwise: bool) -> jax.Array:
    """Build the packed (3, 2, P_in·C_in, P_out·C_out) kernel from a 3×3
    weight. `k` is HWIO: (3, 3, C_in, C_out) for the stem, (3, 3, 1, C)
    for depthwise. Traced — gradients flow back to `k` through the
    build (static slices by default, gather/scatter fallback)."""
    p_in = 2 * p_out
    kh, kw = 3, 3
    # static index plan (numpy, built once per trace)
    q = np.arange(p_out)
    wt = np.arange(kw)
    qq, ww = np.meshgrid(q, wt, indexing="ij")        # (p_out, 3)
    m = 2 * qq + ww - 1                               # in-pack W offset
    d = (m >= 0).astype(np.int64)                     # 0 → left neighbor
    r = np.where(m >= 0, m, p_in - 1)                 # row position in pack
    if _structured():
        if depthwise:
            # diagonal dense expansion via eye mask (fuses, no scatter):
            # d4[.., ci, co] = k[.., 0, ci]·δ(ci, co)
            d4 = k[:, :, 0, :, None] * jnp.eye(c_in, dtype=k.dtype)
        else:
            d4 = k
        pk = jnp.zeros((kh, 2, p_in * c_in, p_out * c_out), k.dtype)
        for qi in range(p_out):
            for wi in range(kw):
                pk = pk.at[:, int(d[qi, wi]),
                           int(r[qi, wi]) * c_in:(int(r[qi, wi]) + 1) * c_in,
                           qi * c_out:(qi + 1) * c_out].add(d4[:, wi])
        return pk
    if depthwise:
        c = np.arange(c_in)
        # rows: (p_out, 3, C) — input lane r*C+c; cols: q*C+c
        rows = (r[:, :, None] * c_in + c[None, None, :])
        cols = (qq[:, :, None] * c_out + c[None, None, :])
        dd = np.broadcast_to(d[:, :, None], rows.shape)
        wtt = np.broadcast_to(ww[:, :, None], rows.shape)
        vals = k[:, wtt.ravel(), 0, np.tile(c, p_out * kw)]   # (3, E)
    else:
        ci = np.arange(c_in)
        co = np.arange(c_out)
        cc_i, cc_o = np.meshgrid(ci, co, indexing="ij")       # (C_in, C_out)
        rows = (r[:, :, None, None] * c_in + cc_i[None, None])
        cols = (qq[:, :, None, None] * c_out + cc_o[None, None])
        dd = np.broadcast_to(d[:, :, None, None], rows.shape)
        wtt = np.broadcast_to(ww[:, :, None, None], rows.shape)
        vals = k[:, wtt.ravel(), cc_i[None].repeat(p_out * kw, 0).ravel(),
                 np.tile(cc_o.ravel(), p_out * kw)]           # (3, E)
    pk = jnp.zeros((kh, 2, p_in * c_in, p_out * c_out), k.dtype)
    ht = np.repeat(np.arange(kh), rows.size)
    return pk.at[ht,
                 np.tile(dd.ravel(), kh),
                 np.tile(rows.ravel(), kh),
                 np.tile(cols.ravel(), kh)].add(vals.ravel())


def _block_diag_kernel(w: jax.Array, p: int) -> jax.Array:
    """1×1 conv weight (1, 1, C_in, C_out) → (1, 1, P·C_in, P·C_out)
    block-diagonal packed kernel."""
    c_in, c_out = w.shape[2], w.shape[3]
    if _structured():
        # kron(eye(p), w): one broadcast multiply, no scatter
        eye = jnp.eye(p, dtype=w.dtype)[:, None, :, None]
        pk = (eye * w[0, 0][None, :, None, :]).reshape(
            1, 1, p * c_in, p * c_out)
        return pk
    ci = np.arange(c_in)
    co = np.arange(c_out)
    cc_i, cc_o = np.meshgrid(ci, co, indexing="ij")
    pp = np.repeat(np.arange(p), c_in * c_out)
    rows = pp * c_in + np.tile(cc_i.ravel(), p)
    cols = pp * c_out + np.tile(cc_o.ravel(), p)
    pk = jnp.zeros((1, 1, p * c_in, p * c_out), w.dtype)
    vals = w[0, 0, np.tile(cc_i.ravel(), p), np.tile(cc_o.ravel(), p)]
    return pk.at[0, 0, rows, cols].set(vals)


def packed_conv_s2(x: jax.Array, pk: jax.Array) -> jax.Array:
    """The packed stride-2 3×3 conv: one standard XLA conv with a (3, 2)
    window over (H, W/P), strides (2, 1), padding ((1,1), (1,0))."""
    return jax.lax.conv_general_dilated(
        x, pk, window_strides=(2, 1), padding=((1, 1), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def packed_conv_1x1(x: jax.Array, pk: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, pk, window_strides=(1, 1), padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def packed_batchnorm(bn, x: jax.Array, c: int) -> jax.Array:
    """nnx.BatchNorm semantics on a packed (..., P·C) tensor: per-channel
    statistics via the logical (..., P, C) view (flax's `_compute_stats`,
    so fp32 fast-variance and stat math match the NHWC path), normalize
    in packed layout with P-tiled params, update the module's running
    stats in place."""
    p = x.shape[-1] // c
    scale = bn.scale[...] if bn.scale is not None else None
    bias = bn.bias[...] if bn.bias is not None else None
    xp, mean, var, scale, bias = bn.promote_dtype(
        (x, bn.mean[...], bn.var[...], scale, bias), dtype=bn.dtype)
    if not bn.use_running_average:
        view = xp.reshape(*xp.shape[:-1], p, c)
        mean, var = _fnorm._compute_stats(
            view, tuple(range(view.ndim - 1)), dtype=bn.dtype,
            use_fast_variance=bn.use_fast_variance)
        sg = jax.lax.stop_gradient
        bn.mean[...] = sg(bn.momentum * bn.mean[...]
                          + (1 - bn.momentum) * mean)
        bn.var[...] = sg(bn.momentum * bn.var[...]
                         + (1 - bn.momentum) * var)
    mul = jax.lax.rsqrt(var + bn.epsilon)
    args = [xp]
    if scale is not None:
        mul = mul * scale
        args.append(scale)
    y = (xp - jnp.tile(mean, p)) * jnp.tile(mul, p)
    if bias is not None:
        y = y + jnp.tile(bias, p)
        args.append(bias)
    from flax.nnx.nn import dtypes as _fdtypes
    out_dtype = _fdtypes.canonicalize_dtype(*args, dtype=bn.dtype)
    return jnp.asarray(y, out_dtype)


def _conv_compute(conv, x: jax.Array, pk: jax.Array) -> tuple:
    """Apply nnx.Conv's dtype promotion contract to (x, packed kernel)."""
    if conv.dtype is not None:
        return x.astype(conv.dtype), pk.astype(conv.dtype)
    d = jnp.promote_types(x.dtype, pk.dtype)
    return x.astype(d), pk.astype(d)


def enabled() -> bool:
    """Routing default: on for TPU backends, overridable via env.
    FASTSCNN_PACKED_LDS=1 forces on (e.g. CPU parity tests), =0 off."""
    env = os.environ.get("FASTSCNN_PACKED_LDS")
    if env is not None:
        return env != "0"
    return jax.default_backend() == "tpu"


def supports(x_shape: tuple, p1: int | None = None) -> bool:
    """W must divide by the stem's input pack (2·p1; every later layer's
    divisibility follows because Wp stays constant down the chain)."""
    (stem_in, _), _, _ = chain_packs(p1)
    return x_shape[2] % stem_in == 0


def routable(lds) -> bool:
    """Architecture guard: `lds_forward` hard-codes ReLU after every
    BN, so only route an LDS whose five ConvBNActs all declare act
    'relu' (no PReLU module, no act=None/relu6 variants) — a
    non-default LearningToDownsample must silently keep the NHWC path,
    not train with different math."""
    cbas = (lds.conv, lds.ds1.dw, lds.ds1.pw, lds.ds2.dw, lds.ds2.pw)
    return all(cba.act is None and getattr(cba, "_act_name", None) == "relu"
               for cba in cbas)


def lds_forward(lds, x: jax.Array, p1: int | None = None) -> jax.Array:
    """Packed-layout forward of models.fastscnn.LearningToDownsample,
    using its exact parameters/BN state. Returns NHWC (N, H/8, W/8, 64)."""
    relu = jax.nn.relu
    stem_pack, ds1_pack, ds2_pack = chain_packs(p1)

    def bn_act(cba, y, c, p):
        # folded-BN serving path (ops.fold): bn is None and the conv
        # carries the folded bias — apply it P-tiled in packed layout
        if cba.conv.bias is not None:
            y = y + jnp.tile(cba.conv.bias[...], p).astype(y.dtype)
        if cba.bn is not None:
            y = packed_batchnorm(cba.bn, y, c)
        return relu(y)

    # stem: conv 3→32 s2 + BN + ReLU
    conv = lds.conv.conv
    c1 = conv.out_features
    pk = _scatter_kernel(conv.kernel[...], conv.in_features, c1,
                         stem_pack[1], depthwise=False)
    from torch_semantic_segmentation_tpu.ops.packed_ops import PackedImages
    if isinstance(x, PackedImages):
        # packed-input aug API (transforms.AugmentConfig.pack): consume
        # the pre-packed tensor directly when its factor matches the
        # stem's input pack; otherwise fall back through NHWC (reshapes
        # only — XLA cancels them)
        if x.data.shape[-1] == stem_pack[0] * conv.in_features:
            xp = x.data
        else:
            xp = pack(x.unpack(), stem_pack[0])
    else:
        xp = pack(x, stem_pack[0])
    xp, pk = _conv_compute(conv, xp, pk)
    y = packed_conv_s2(xp, pk)
    y = bn_act(lds.conv, y, c1, stem_pack[1])

    for sep, (p_in, p_out) in ((lds.ds1, ds1_pack), (lds.ds2, ds2_pack)):
        dw, pw = sep.dw.conv, sep.pw.conv
        c_in, c_out = pw.in_features, pw.out_features
        if y.shape[-1] != p_in * c_in:     # chain-consistent: no-op
            y = repack(y, c_in, p_in)
        pk_dw = _scatter_kernel(dw.kernel[...], c_in, c_in, p_out,
                                depthwise=True)
        yd, pk_dw = _conv_compute(dw, y, pk_dw)
        y = packed_conv_s2(yd, pk_dw)
        y = bn_act(sep.dw, y, c_in, p_out)
        pk_pw = _block_diag_kernel(pw.kernel[...], p_out)
        yp, pk_pw = _conv_compute(pw, y, pk_pw)
        y = packed_conv_1x1(yp, pk_pw)
        y = bn_act(sep.pw, y, c_out, p_out)
    return unpack(y, lds.ds2.pw.conv.out_features)
