"""Pallas TPU kernel: fused ×2 bilinear upsample + skip concat.

The BASELINE.json north_star names this fusion explicitly: "Pallas kernels
for the upsample+concat skip fusion". The decoder skip path (UNet config 3;
SURVEY.md §2.2 "Bilinear upsample") otherwise costs three HBM round-trips:
write the upsampled map, read it and the skip back, write the concat. This
kernel streams row-bands of the low-res input through VMEM and writes the
final (upsampled ∥ skip) tensor directly — the upsampled intermediate never
exists in HBM.

Kernel design (pallas_guide.md patterns):
- grid (N, H/TH): one program per image × input-row-band. The low-res
  input stays in HBM (`memory_space=ANY`); each program DMAs its band plus
  a 1-row halo (input pre-padded edge-style by 1 row, so the slice is
  always in range) into VMEM scratch (double-buffer-free: one band is
  small and the DMA overlaps the previous program's compute via the
  pipeline Mosaic builds from the grid).
- H upsample uses the halo rows directly: even rows = 0.25·x[i−1]+0.75·x[i],
  odd = 0.75·x[i]+0.25·x[i+1] (align_corners=False, matching
  `ops.upsample.resize_bilinear` and torch). Interleave = stack+reshape on
  the outermost (non-tiled) axis — free in Mosaic.
- W upsample avoids a sublane-hostile strided store: `pltpu.repeat` each
  row pair then blend with the ±1 `pltpu.roll` under an even/odd lane
  mask; boundary lanes fall back to the repeated value (clamp semantics).
- The skip block arrives through a normal VMEM BlockSpec and is written to
  the channel tail of the same output block.

Backward: d_skip is a channel slice of the cotangent; d_low is the adjoint
×2-downsample, expressed as two small MXU matmuls (transposed interpolation
matrices from ops.upsample) — defined via jax.custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torch_semantic_segmentation_tpu.ops.upsample import (
    _interp_matrix, resize_bilinear)


def _pick_tile(h: int, w: int, c_total: int, itemsize: int,
               budget_bytes: int = 2 * 1024 * 1024) -> int | None:
    """Largest divisor TH of h whose output block (2TH, 2W, Ctot) fits the
    VMEM budget (Mosaic double-buffers every block, hence the small cap).
    None → no tiling fits; caller falls back to the XLA path."""
    for th in sorted((d for d in range(1, h + 1) if h % d == 0), reverse=True):
        out_bytes = 2 * th * 2 * w * c_total * itemsize
        if out_bytes <= budget_bytes:
            return th
    return None


def _up2x_rows(xm, x0, xp):
    """Even/odd output rows from a band and its ±1-row halo; interleave."""
    th = x0.shape[0]
    even = 0.25 * xm + 0.75 * x0
    odd = 0.75 * x0 + 0.25 * xp
    y = jnp.stack([even, odd], axis=1)          # (TH, 2, W, C)
    return y.reshape(th * 2, *x0.shape[1:])      # (2TH, W, C)


def _up2x_lanes(y):
    """×2 bilinear along W: roll-based ±1 neighbours, clamped edges,
    stack+reshape interleave (mirrors the H stage)."""
    h2, w, c = y.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (h2, w, c), 1)
    prev = pltpu.roll(y, 1, axis=1)               # prev[:, i] = y[:, i-1]
    prev = jnp.where(col == 0, y, prev)           # clamp left edge
    nxt = pltpu.roll(y, w - 1, axis=1)            # nxt[:, i] = y[:, i+1]
    nxt = jnp.where(col == w - 1, y, nxt)         # clamp right edge
    even = 0.25 * prev + 0.75 * y
    odd = 0.75 * y + 0.25 * nxt
    out = jnp.stack([even, odd], axis=2)          # (2TH, W, 2, C)
    return out.reshape(h2, 2 * w, c)


def _kernel(x_ref, xm_ref, xp_ref, skip_ref, out_ref, *, c_low: int):
    # fp32 kernel math: matches the reference's fp32 accumulate, and Mosaic
    # only implements lane rotates for 32-bit element types
    y = _up2x_rows(xm_ref[0].astype(jnp.float32),
                   x_ref[0].astype(jnp.float32),
                   xp_ref[0].astype(jnp.float32))
    y = _up2x_lanes(y)                            # (2TH, 2W, C)
    out_ref[0, :, :, :c_low] = y.astype(out_ref.dtype)
    out_ref[0, :, :, c_low:] = skip_ref[0]


def _forward(low: jax.Array, skip: jax.Array, *, interpret: bool) -> jax.Array:
    n, h, w, cl = low.shape
    ns, hs, ws, cs = skip.shape
    assert (ns, hs, ws) == (n, 2 * h, 2 * w), (low.shape, skip.shape)
    ct = cl + cs
    th = _pick_tile(h, w, ct, max(low.dtype.itemsize, 4))
    if th is None:
        return _reference(low, skip)
    # halo rows as whole shifted arrays (edge-clamped): Mosaic pipelines the
    # three row-band reads itself; no manual DMA / sub-tile HBM slicing
    xm = jnp.concatenate([low[:, :1], low[:, :-1]], axis=1)   # x[i-1]
    xp = jnp.concatenate([low[:, 1:], low[:, -1:]], axis=1)   # x[i+1]

    low_spec = pl.BlockSpec((1, th, w, cl), lambda ni, hi: (ni, hi, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, c_low=cl),
        grid=(n, h // th),
        in_specs=[
            low_spec, low_spec, low_spec,
            pl.BlockSpec((1, 2 * th, 2 * w, cs),
                         lambda ni, hi: (ni, hi, 0, 0),
                         memory_space=pltpu.VMEM),           # skip band
        ],
        out_specs=pl.BlockSpec((1, 2 * th, 2 * w, ct),
                               lambda ni, hi: (ni, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, ct), skip.dtype),
        interpret=interpret,
    )(low, xm, xp, skip)
    return out


def _reference(low: jax.Array, skip: jax.Array) -> jax.Array:
    """XLA fallback: MXU-matmul resize + concat (numerically identical)."""
    up = resize_bilinear(low, (skip.shape[1], skip.shape[2]))
    return jnp.concatenate([up.astype(skip.dtype), skip], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused(low, skip, interpret):
    return _forward(low, skip, interpret=interpret)


def _fused_fwd(low, skip, interpret):
    # zero-size residual: its aval carries low's (shape, dtype) statically
    spec = jnp.zeros((0,) + low.shape[1:], low.dtype)
    return _forward(low, skip, interpret=interpret), spec


def _fused_bwd(interpret, residuals, g):
    (_, h, w, cl), low_dtype = residuals.shape, residuals.dtype
    g_low = g[..., :cl].astype(jnp.float32)
    g_skip = g[..., cl:]
    # adjoint of the ×2 bilinear resize: transposed interpolation
    # matmuls. fp32 inputs contract at HIGHEST to match the fp32
    # forward/reference contract (TPU DEFAULT decomposes f32 matmuls
    # through bf16 passes — measured 2.5e-3 rel on-chip); bf16 training
    # keeps the fast DEFAULT path.
    prec = (jax.lax.Precision.HIGHEST if low_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    wh = jnp.asarray(_interp_matrix(h, 2 * h, False))      # (2h, h)
    ww = jnp.asarray(_interp_matrix(w, 2 * w, False))      # (2w, w)
    d = jnp.einsum("nhwc,ho->nowc", g_low, wh,
                   preferred_element_type=jnp.float32, precision=prec)
    d = jnp.einsum("nhwc,wo->nhoc", d, ww,
                   preferred_element_type=jnp.float32, precision=prec)
    return d.astype(low_dtype), g_skip


_fused.defvjp(_fused_fwd, _fused_bwd)


def upsample2x_concat(low: jax.Array, skip: jax.Array, *,
                      use_pallas: bool | None = None) -> jax.Array:
    """Fused ×2 bilinear upsample of `low` concatenated with `skip` along
    channels: returns (N, 2H, 2W, C_low + C_skip).

    `use_pallas=None` auto-selects: the Pallas kernel on TPU, interpret
    mode under tests when forced, and the XLA reference elsewhere (CPU
    interpret mode is correct but slow — tests opt in explicitly).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        return _reference(low, skip)
    interpret = jax.default_backend() != "tpu"
    return _fused(low, skip, interpret)
