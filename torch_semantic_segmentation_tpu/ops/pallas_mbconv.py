"""Fused (folded-BN 1×1 expand) → ReLU → depthwise-3×3 Pallas kernel.

The inverted-residual blocks of the GFE (SURVEY.md §2.1 "FastSCNN";
§3.4 hot spots) expand C → 6·C with a 1×1 conv before the depthwise —
at stage 1 that is a (N, H/8, W/8, 384) tensor, the LARGEST activation
in the network. With the BN already folded into the expand weights by
`ops.folded_bn` (training mode) the XLA chain is still

    conv1x1 → [e1 to HBM] → dw3×3 reads e1; bwd saves e1, reads it for
    dk and the relu mask, writes/reads its cotangent

≈ 6 HBM crossings of the expanded tensor per block. This kernel keeps
`e1 = relu(x·W' + b')` entirely in VMEM:

- forward: grid (N, H_out/To). Each step expands a row tile of the
  SMALL input on the MXU, applies the nine depthwise taps as
  sublane-shifted FMAs (W taps: pad+slice; H taps: row selects;
  W-stride-2: strided read of a VMEM scratch — all on this platform's
  Mosaic capability list, docs/FULLRES_ROOFLINE.md), and writes only
  the (smaller) dw output.
- backward (custom VJP): grid (N, H_in) in GATHER form — each step
  owns ONE input row v, recomputes e1[v] (a tiny matmul), gathers the
  up-to-3 cotangent rows r with stride·r + dh − 1 = v (parity-masked
  for stride 2; W taps via parity-split strided scratch stores),
  applies the relu mask, and writes dx[v] = (m⊙dE)·W'ᵀ exactly once —
  no per-image VMEM accumulation block (the scatter form's
  whole-image dx block OOMed scoped VMEM at stage shapes, 34 MB > 16).
  Weight/bias/tap gradients accumulate in scratch and flush on the
  last grid step; each e1 row is computed once (the scatter form
  recomputed it 3×).

Unlike the round-2 full-res depthwise routing (a measured negative —
XLA relayout copies around Mosaic custom calls, docs/FULLRES_ROOFLINE
"Round-2 outcome"), the operands here are the block's small input and
output; the 6×-wide tensor is generated and consumed inside.

Numerics: the expand matmul takes bf16 operands with f32 accumulation
and e1 is rounded to bf16 before the taps — the same rounding points as
the XLA folded path — so parity with `relu(conv1x1(x,W')+b')→dw` holds
to bf16 reassociation noise (exact at f32 on CPU interpret tests).

Routing: training-mode InvertedResidual on single-device TPU, gated by
`supports()`; kill switch TPU_SEG_PALLAS_MBCONV=0.
"""

from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_routing_suppressed = False


@contextlib.contextmanager
def suppress_routing():
    """Disable routing for the enclosed trace. Used by make_train_step's
    remat wrapper: under rematerialisation the kernel's forward runs
    TWICE and its residual-byte saving is moot — measured 8% slower at
    the crop-1024 remat tier (346 → 319 img/s) while winning 2× on the
    same shapes remat-off."""
    global _routing_suppressed
    prev = _routing_suppressed
    _routing_suppressed = True
    try:
        yield
    finally:
        _routing_suppressed = prev


def enabled() -> bool:
    if _routing_suppressed:
        return False
    env = os.environ.get("TPU_SEG_PALLAS_MBCONV")
    if env is not None:
        return env != "0"
    return jax.default_backend() == "tpu" and jax.device_count() == 1


def supports(x_shape: tuple, c_exp: int, stride: int) -> bool:
    """Shape guard: even spatial dims for stride 2, lane-clean expanded
    width, sublane-friendly W, VMEM-bounded tiles (a forward row-tile
    always exists — _tile_rows falls back to 1)."""
    if len(x_shape) != 4 or stride not in (1, 2):
        return False
    n, h, w, c_in = x_shape
    if c_exp % 128:          # 576 (stage-2 tail blocks) stays on XLA
        return False
    if w % (8 * stride) or w // stride > 512:
        return False
    h_out = h // stride
    if stride == 2 and h % 2:
        return False
    # VMEM budget: e tile (stride·To+1, W, Ce) bf16 + acc (W, Ce) f32
    to = _tile_rows(h_out)
    if (stride * to + 1) * w * c_exp * 2 + w * c_exp * 4 > 6 * 1024 * 1024:
        return False
    # backward: e tile (Ti, W, Ce) bf16 + f32 scratch copy (stride 2)
    ti = _bwd_tile_rows(h, stride)
    if ti == 0 or ti * w * c_exp * 6 > 10 * 1024 * 1024:
        return False
    return True


def _tile_rows(h_out: int) -> int:
    for to in (8, 4, 2, 1):
        if h_out % to == 0:
            return to
    return 0


def _shift_w(v: jax.Array, delta: int) -> jax.Array:
    """Shift a (W, C) value along W (sublane dim) by `delta` with zero
    fill: result[w] = v[w + delta] (out-of-range → 0). pad+slice only —
    Mosaic-safe on this platform."""
    w = v.shape[0]
    if delta == 0:
        return v
    if delta > 0:
        pad = [(0, delta), (0, 0)]
        return jnp.pad(v, pad)[delta:delta + w]
    pad = [(-delta, 0), (0, 0)]
    return jnp.pad(v, pad)[:w]


def _expand_rows(x2d: jax.Array, w_ref, b_ref) -> jax.Array:
    """relu(x·W' + b') for a (R, Cin) flat row-batch → (R, Ce) bf16."""
    acc = jnp.dot(x2d, w_ref[:], preferred_element_type=jnp.float32)
    return jax.nn.relu(acc + b_ref[0][None, :]).astype(jnp.bfloat16)


def _fwd_kernel(stride, to, wdim, wout, x_top_ref, x_main_ref, x_bot_ref,
                w_ref, b_ref, k_ref, out_ref, acc_ref):
    j = pl.program_id(1)
    tb = stride * to
    # e rows for this tile: main block rows [0, tb) plus ONE halo row on
    # each side, fetched as single-row blocks (a full-tile halo ref would
    # re-DMA the neighbour tiles 3×)
    xm = x_main_ref[0]                                     # (tb, W, Cin)
    c_in = xm.shape[-1]
    e_main = _expand_rows(xm.reshape(tb * wdim, c_in), w_ref, b_ref
                          ).reshape(tb, wdim, -1)
    e_top = _expand_rows(x_top_ref[0, 0], w_ref, b_ref)    # (W, Ce)
    e_top = jnp.where(j > 0, e_top, 0).astype(jnp.bfloat16)
    e_bot = _expand_rows(x_bot_ref[0, 0], w_ref, b_ref)
    e_bot = jnp.where(j < pl.num_programs(1) - 1, e_bot,
                      0).astype(jnp.bfloat16)

    def e_row(i):            # i in [-1, tb]
        if i == -1:
            return e_top
        if i == tb:
            return e_bot
        return e_main[i]

    for r in range(to):
        acc = jnp.zeros((wdim, e_main.shape[-1]), jnp.float32)
        for dh in range(3):
            row = e_row(stride * r + dh - 1)
            for dw in range(3):
                # bf16-rounded taps, f32 products/accumulate — the same
                # rounding points as the XLA bf16 dw conv
                tap = (k_ref[3 * dh + dw].astype(jnp.bfloat16)
                       .astype(jnp.float32))[None, :]
                acc += _shift_w(row, dw - 1).astype(jnp.float32) * tap
        if stride == 2:
            # Mosaic strided loads need a 128-wide base memref: stage
            # the row through (Ce/128, W, 128) lane chunks, subsample
            # each, lane-concat back (capability map: lane concat ✓)
            ce = acc.shape[-1]
            c3 = ce // 128
            subs = []
            for ci in range(c3):
                acc_ref[ci] = acc[:, 128 * ci:128 * (ci + 1)]
                subs.append(acc_ref[ci, ::2, :])
            out_ref[0, r] = jnp.concatenate(subs, axis=-1
                                            ).astype(out_ref.dtype)
        else:
            out_ref[0, r] = acc.astype(out_ref.dtype)


def _bwd_kernel(stride, ti, h_in, wdim, wout, x_ref, gm_ref, g_ref, gp_ref,
                w_ref, b_ref, k_ref,
                dx_ref, dw_ref, db_ref, dk_ref,
                e_scr, de_scr, dwacc, dbacc, dkacc):
    """Gather-form backward: grid step (i, j) owns input rows
    [j·Ti, (j+1)·Ti).

    Output row r pairs with input row v through tap dh iff
    stride·r + dh − 1 = v, i.e. r = (v + 1 − dh)/stride — for the whole
    tile that is g rows [j·Tg − 1, (j+1)·Tg] with Tg = Ti/stride: the
    main g tile plus ONE halo row on each side. Within the tile the
    local g index for (row r, tap dh) is the STATIC floor((r+1−dh)/s).
    Validity is applied by zeroing the gathered row, so dW/db/dx need
    no extra masking (they consume the already-masked dE sum).
    """
    j = pl.program_id(1)
    first = jnp.logical_and(pl.program_id(0) == 0, j == 0)
    last = jnp.logical_and(pl.program_id(0) == pl.num_programs(0) - 1,
                           j == pl.num_programs(1) - 1)

    @pl.when(first)
    def _():
        dwacc[:] = jnp.zeros_like(dwacc)
        dbacc[:] = jnp.zeros_like(dbacc)
        dkacc[:] = jnp.zeros_like(dkacc)

    tg = ti // stride
    xt = x_ref[0]                                          # (Ti, W, Cin)
    c_in = xt.shape[-1]
    # one MXU call for the whole tile's expanded rows
    e_tile = _expand_rows(xt.reshape(ti * wdim, c_in), w_ref, b_ref
                          ).reshape(ti, wdim, -1)          # (Ti, W, Ce) bf16
    ce = e_tile.shape[-1]
    c3 = ce // 128
    if stride == 2:
        # f32 scratch: Mosaic strided loads need 32-bit data
        for r in range(ti):
            for ci in range(c3):
                e_scr[r * c3 + ci] = (
                    e_tile[r, :, 128 * ci:128 * (ci + 1)]
                    .astype(jnp.float32))

    def g_local(l):          # l in [-1, tg]: halo row / main tile row
        if l == -1:
            return gm_ref[0, 0]
        if l == tg:
            return gp_ref[0, 0]
        return g_ref[0, l]

    dwacc_t = jnp.zeros_like(dwacc[:])
    for r in range(ti):
        v_first = j * ti      # traced global index of tile row 0
        if stride == 1:
            # (valid, local g row) for dh = 0,1,2: r+1, r, r−1
            valids = (v_first + r < h_in - 1, jnp.bool_(True),
                      jnp.logical_or(r >= 1, j > 0))
            locals_ = (r + 1, r, r - 1)
        else:
            odd = r % 2 == 1  # python static: ti is a multiple of stride
            # dh=0 also needs r_g = (v+1)/2 < h_out, i.e. v < h_in − 1;
            # dh=2 needs v ≥ 1, implied by v odd
            valids = (jnp.logical_and(jnp.bool_(odd),
                                      v_first + r < h_in - 1),
                      jnp.bool_(not odd), jnp.bool_(odd))
            locals_ = ((r + 1) // 2, r // 2,
                       (r - 1) // 2 if r >= 1 else -1)
        e = e_tile[r]
        de = jnp.zeros((wdim, ce), jnp.float32)
        for dh in range(3):
            gv = (g_local(locals_[dh]).astype(jnp.float32)
                  * valids[dh].astype(jnp.float32))        # (Wout, Ce)
            kt = [k_ref[3 * dh + dw].astype(jnp.float32)[None, :]
                  for dw in range(3)]
            if stride == 2:
                even = kt[1] * gv                          # u = 2w'
                odd_r = kt[2] * gv + kt[0] * _shift_w(gv, 1)  # u = 2w'±1
                # parity interleave via strided stores (128-lane chunks)
                for ci in range(c3):
                    sl = slice(128 * ci, 128 * (ci + 1))
                    de_scr[ci, 0::2] = even[:, sl]
                    de_scr[ci, 1::2] = odd_r[:, sl]
                de += jnp.concatenate([de_scr[ci] for ci in range(c3)],
                                      axis=-1)
            else:
                # dE[u] += k[dw]·g[u − dw + 1]: dw=0 pairs with g[u+1]
                de += (kt[1] * gv + kt[0] * _shift_w(gv, 1)
                       + kt[2] * _shift_w(gv, -1))
            # dk taps: Σ_{w'} g[w'] ⊙ e[stride·w' + dw − 1]
            for dw in range(3):
                if stride == 2:
                    off = 0 if dw == 1 else 1
                    ev = jnp.concatenate(
                        [e_scr[r * c3 + ci, off::2, :] for ci in range(c3)],
                        axis=-1)
                    # dw == 0: e[2w'−1] pairs with g[w'] for w' ≥ 1
                    gg = _shift_w(gv, 1) if dw == 0 else gv
                    dkacc[3 * dh + dw] += jnp.sum(gg * ev, axis=0)
                else:
                    dkacc[3 * dh + dw] += jnp.sum(
                        _shift_w(e.astype(jnp.float32), dw - 1) * gv,
                        axis=0)

        # Mosaic can't cmpf bf16 vectors on this target — compare in f32
        m = (e.astype(jnp.float32) > 0).astype(jnp.float32)
        dem = m * de                                       # (W, Ce) f32
        demb = dem.astype(jnp.bfloat16)
        # dx row: (W, Ce) · (Ce, Cin) — contract Ce (lane dim of both).
        # Write at the residual's dtype directly: an f32 dx would add a
        # full-size materialize+cast pass outside the kernel (~2 GB/step
        # at stage-1 b40 full-res).
        dx_ref[0, r] = jax.lax.dot_general(
            demb, w_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dx_ref.dtype)
        # dW' += xᵀ·dem ; db' += Σ dem
        dwacc_t += jax.lax.dot_general(
            xt[r].astype(jnp.bfloat16), demb,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (Cin, Ce)
        dbacc[:] += jnp.sum(dem, axis=0)[None, :]
    dwacc[:] += dwacc_t

    @pl.when(last)
    def _():
        dw_ref[:] = dwacc[:]
        db_ref[:] = dbacc[:]
        dk_ref[:] = dkacc[:]


def _bwd_tile_rows(h: int, stride: int) -> int:
    """Input-row tile for the backward: largest of 8/4/2 that divides h
    and is a multiple of the stride (1 only when nothing else fits)."""
    for ti in (8, 4, 2):
        if h % ti == 0 and ti % stride == 0:
            return ti
    return 1 if stride == 1 else 0


def _fwd(x, w, b, k, stride, interpret):
    n, h, wdim, c_in = x.shape
    ce = w.shape[1]
    h_out, w_out = h // stride, wdim // stride
    to = _tile_rows(h_out)
    t = h_out // to
    tb = stride * to
    wb = w.astype(jnp.bfloat16)
    b2 = b.astype(jnp.float32).reshape(1, ce)
    k2 = k.reshape(9, ce).astype(jnp.float32)
    grid = (n, t)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, stride, to, wdim, w_out),
        grid=grid,
        in_specs=[
            # single-row halos (block index in 1-row units)
            pl.BlockSpec((1, 1, wdim, c_in),
                         lambda i, j, *, tb=tb:
                         (i, jnp.maximum(j * tb - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, wdim, c_in), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wdim, c_in),
                         lambda i, j, *, tb=tb, hh=h:
                         (i, jnp.minimum((j + 1) * tb, hh - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, ce), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ce), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, ce), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, to, w_out, ce), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, ce), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((ce // 128, wdim, 128), jnp.float32)],
        interpret=interpret,
    )(x, x, x, wb, b2, k2)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_expand_dw(x, w, b, k, stride: int, interpret: bool = False):
    """dw3×3_{stride}(relu(x·w + b)) with the expanded tensor VMEM-only.

    x: (N, H, W, Cin); w: (Cin, Ce) folded expand weights; b: (Ce,)
    folded bias; k: (3, 3, Ce) depthwise taps (zero 'same' padding 1).
    Callers must check `supports(x.shape, Ce, stride)`.
    """
    return _fwd(x, w, b, k, stride, interpret)


def _vjp_fwd(x, w, b, k, stride, interpret):
    return _fwd(x, w, b, k, stride, interpret), (x, w, b, k)


def _vjp_bwd(stride, interpret, res, g):
    x, w, b, k = res
    n, h, wdim, c_in = x.shape
    ce = w.shape[1]
    h_out, w_out = h // stride, wdim // stride
    wb = w.astype(jnp.bfloat16)
    b2 = b.astype(jnp.float32).reshape(1, ce)
    k2 = k.reshape(9, ce).astype(jnp.float32)
    ti = _bwd_tile_rows(h, stride)
    tg = ti // stride
    grid = (n, h // ti)
    dx, dwf, dbf, dkf = pl.pallas_call(
        functools.partial(_bwd_kernel, stride, ti, h, wdim, w_out),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ti, wdim, c_in), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            # g halo rows (single-row blocks) around the main g tile
            pl.BlockSpec((1, 1, w_out, ce),
                         lambda i, j, *, t=tg:
                         (i, jnp.maximum(j * t - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tg, w_out, ce), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w_out, ce),
                         lambda i, j, *, t=tg, ho=h_out:
                         (i, jnp.minimum((j + 1) * t, ho - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, ce), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ce), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, ce), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, ti, wdim, c_in), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, ce), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ce), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, ce), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, wdim, c_in), x.dtype),
            jax.ShapeDtypeStruct((c_in, ce), jnp.float32),
            jax.ShapeDtypeStruct((1, ce), jnp.float32),
            jax.ShapeDtypeStruct((9, ce), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((ti * (ce // 128), wdim, 128), jnp.float32),  # e (s2)
            pltpu.VMEM((ce // 128, wdim, 128), jnp.float32),  # dE scatter
            pltpu.VMEM((c_in, ce), jnp.float32),
            pltpu.VMEM((1, ce), jnp.float32),
            pltpu.VMEM((9, ce), jnp.float32),
        ],
        interpret=interpret,
    )(x, g, g, g, wb, b2, k2)
    return (dx.astype(x.dtype), dwf.astype(w.dtype),
            dbf.reshape(ce).astype(b.dtype),
            dkf.reshape(3, 3, ce).astype(k.dtype))


fused_expand_dw.defvjp(_vjp_fwd, _vjp_bwd)


def expand_dw_reference(x, w, b, k, stride: int):
    """Plain-XLA reference: relu(conv1x1) → depthwise 3×3 (pad 1)."""
    e = jax.nn.relu(
        jnp.einsum("nhwa,ac->nhwc", x.astype(jnp.bfloat16),
                   w.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
        + b.astype(jnp.float32)).astype(jnp.bfloat16)
    ce = w.shape[1]
    kd = k.reshape(3, 3, 1, ce).astype(jnp.bfloat16)
    return jax.lax.conv_general_dilated(
        e, kd, window_strides=(stride, stride), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=ce)
