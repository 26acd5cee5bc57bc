"""Bilinear / nearest resize with exact PyTorch semantics, as MXU matmuls.

The reference (torch `F.interpolate`, SURVEY.md §2.2 "Bilinear upsample")
supports both `align_corners=False` (torch default) and `align_corners=True`
(common in segmentation heads). `jax.image.resize` only matches the former,
so we implement separable 1-D interpolation as two dense matrix products
(out = Wh @ x @ Ww^T per image/channel) — exact to torch's formula for both
conventions and MXU-friendly: for segmentation-sized feature maps the
(H_out, H_in) weight matrices are tiny and the resize becomes two batched
matmuls that XLA tiles onto the systolic array, instead of a gather.

Layout: NHWC throughout (TPU-native).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense 1-D linear-interpolation matrix W (out_size, in_size), float32.

    Matches torch.nn.functional.interpolate(mode='bilinear'):
      align_corners=True : src = i * (in-1) / (out-1)
      align_corners=False: src = (i + 0.5) * in/out - 0.5, clamped to [0, in-1]
    """
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = i * (in_size - 1) / max(out_size - 1, 1)
    else:
        src = (i + 0.5) * (in_size / out_size) - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float64)
    w = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(w, (rows, lo), 1.0 - frac)
    np.add.at(w, (rows, hi), frac)
    return w.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """Nearest-neighbour source index per output position (torch 'nearest')."""
    # torch mode='nearest': src = floor(i * in/out)
    i = np.arange(out_size, dtype=np.float64)
    idx = np.floor(i * (in_size / out_size)).astype(np.int32)
    return np.clip(idx, 0, in_size - 1)


def resize_bilinear(
    x: jax.Array,
    size: tuple[int, int],
    *,
    align_corners: bool = False,
) -> jax.Array:
    """Bilinear-resize NHWC `x` to spatial `size` = (H_out, W_out).

    Exact torch `F.interpolate(mode='bilinear')` parity (both align_corners
    conventions); implemented as two matmuls (H then W) so the MXU does the
    work. Accumulates in float32 and casts back to the input dtype.
    """
    n, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    dtype = x.dtype
    wh = jnp.asarray(_interp_matrix(h, oh, align_corners))
    ww = jnp.asarray(_interp_matrix(w, ow, align_corners))
    # (N,H,W,C) -> (N,OH,W,C): contract H with Wh.
    # HIGHEST precision: the TPU MXU otherwise rounds fp32 operands to
    # bf16 (~1e-2 rel err), breaking the checkpoint logit-parity contract
    y = jnp.einsum("nhwc,oh->nowc", x.astype(jnp.float32), wh,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("nhwc,ow->nhoc", y, ww, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return y.astype(dtype)


def resize_nearest(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Nearest-neighbour resize of NHWC `x` (torch mode='nearest' parity)."""
    n, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    hi = jnp.asarray(_nearest_index(h, oh))
    wi = jnp.asarray(_nearest_index(w, ow))
    return x[:, hi][:, :, wi]


def upsample2x_bilinear(x: jax.Array, *, align_corners: bool = False) -> jax.Array:
    """Convenience ×2 bilinear upsample (the hot skip-connection path)."""
    n, h, w, c = x.shape
    return resize_bilinear(x, (2 * h, 2 * w), align_corners=align_corners)


def resize_bilinear_nhcw(x: jax.Array, size: tuple[int, int], *,
                         align_corners: bool = False,
                         out_dtype=None) -> jax.Array:
    """Bilinear-resize NHWC `x` to `size`, returned in N,H,C,W layout —
    fp32 by default; pass `out_dtype` (e.g. the compute dtype, as the
    fused resize-losses do) to cast in the matmul epilogue so the full-res
    intermediate never materialises in fp32 (4× HBM).

    The lane-major tail layout (used by losses.resize_cross_entropy_loss,
    the multi-scale evaluator and ops.resize_argmax): with C classes (19)
    minor, full-res vector ops waste 109/128 lanes; 'n h c w' puts W
    (≥1024) in the lanes. Matmuls run in x's compute dtype (bf16 MXU for
    bf16 models) with fp32 accumulation; the intermediate between the W
    and H passes is kept in x's dtype so the full-res fp32 tensor never
    round-trips HBM twice. fp32 inputs use HIGHEST MXU precision so the
    result matches `resize_bilinear` (the TPU MXU otherwise rounds fp32
    operands to bf16, ~1e-2 rel err).
    """
    n, h, w, c = x.shape
    oh, ow = size
    out_dtype = jnp.float32 if out_dtype is None else out_dtype
    if (oh, ow) == (h, w):
        return jnp.transpose(x, (0, 1, 3, 2)).astype(out_dtype)
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    # bf16 inputs accumulate at bf16: the interp matrices are 2-hot, so at
    # most two terms ever sum, and forcing f32 accumulation makes XLA
    # MATERIALIZE the f32 einsum output before the out_dtype cast — at
    # full res that is a 6.4 GB write + convert pass per step (measured,
    # scripts/diag_head_hlo.py). fp32 inputs keep exact f32 accumulation
    # (the resize_bilinear-parity contract).
    acc = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    ww = jnp.asarray(_interp_matrix(w, ow, align_corners), x.dtype)
    wh = jnp.asarray(_interp_matrix(h, oh, align_corners), x.dtype)
    y = jnp.einsum("nhwc,kw->nhck", x, ww, precision=prec,
                   preferred_element_type=acc).astype(x.dtype)
    return jnp.einsum("nhck,oh->nock", y, wh, precision=prec,
                      preferred_element_type=acc
                      ).astype(out_dtype)           # (N, OH, C, OW)


def resize_argmax(logits: jax.Array, size: tuple[int, int], *,
                  align_corners: bool = False,
                  out_dtype=jnp.uint8) -> jax.Array:
    """argmax over classes of the bilinearly upsampled logits — the serving
    tail (`serving.make_predict_fn(output="ids")`) for models built with
    `upsample_logits=False`.

    Same math as `argmax(resize_bilinear(logits, size), -1)` but in the
    lane-major N,H,C,W layout (`resize_bilinear_nhcw`): the argmax runs as
    C lane-parallel compares and the full-res logits never materialise in
    NHWC.
    """
    oh, ow = size
    if (oh, ow) == (logits.shape[1], logits.shape[2]):
        return jnp.argmax(logits, axis=-1).astype(out_dtype)
    x = resize_bilinear_nhcw(logits, size, align_corners=align_corners)
    return jnp.argmax(x, axis=2).astype(out_dtype)
