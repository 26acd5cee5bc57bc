"""Pallas TPU kernel: depthwise 3×3 convolution in W-packed layout.

Motivation (docs/FULLRES_ROOFLINE.md): XLA:TPU lowers the full-res
depthwise convs of the real-time zoo (FastSCNN LDS, ContextNet stems —
SURVEY.md §2.2 "Conv2D depthwise") through lane-padded layouts — any
(…, C)-minor tensor with C < 128 pads lanes to 128, so the 32-channel
half-res depthwise moves ~9× its minimum HBM bytes (12.1 GB measured vs
1.3 GB floor for ds1 at b32). Depthwise convs never mix channels, which
makes them expressible in a zero-padding packed layout using only the
Mosaic primitives this platform supports (probe results in the roofline
doc): lane rolls (fp32), iota selects, pad/slice shifts, and — for the
stride-2 group-parity splits, where Mosaic's strided vector loads are
32-bit-only and lane compaction is unsupported — *exact one-hot
selection matmuls on the otherwise idle MXU* (one-hot f32 × bf16-exact
f32 values ⇒ bit-exact row selection).

Layout: NHWC (N, H, W, C) --pure reshape--> (N, H, G, L) where
P = 128/gcd(C, 128), G = W/P, L = P·C, lane ℓ = C·m + c for w = P·g+m.
L is a multiple of 128 ⇒ no lane padding anywhere; the reshape is free
at the XLA boundary (same linear byte order, no transpose, no bitcast),
so the op composes with arbitrary XLA neighbours at zero cost.

Per output row, a tap (dh, dw) needs x[s·h'+dh-1, s·w'+dw-1]:
- rows (dh): direct indexing of the row-band block (+1 halo row via a
  second BlockSpec whose index_map addresses row s·TH·i − 1, clamped and
  zero-masked at the image border);
- lanes (dw, stride 1): roll by ∓C with the group-boundary lane taking
  the adjacent group's value (shift-down/up slab, iota select);
- lanes (dw, stride 2): out lane C·m'+c draws from in lane C·m_src+c of
  group 2g'+δ where 2m'+dw-1 = P·δ + m_src — assembled from the even /
  odd / previous-odd group slabs (selection matmuls) with P
  iota-selected rolls per tap.

Backward is custom-VJP with Pallas kernels: stride-1 dx is the forward
kernel with the flipped kernel; stride-2 dx computes per-group-parity
slabs through the lane-expansion map (dy lane u = (P·ρ+m+1-dw)/2 feeds
dx lane m of parity ρ, the u=P carry from the next group slab) and
merges them with transposed selection matmuls; dk accumulates per-tap
Σ taps(x)⊙dy into a revisited (9, L) fp32 block, folded to (3,3,C)
outside.

All arithmetic is fp32 on the VPU/MXU (bf16 inputs are upcast exactly
per-slab) with a single cast-and-store per output row. Numerically
exact vs fp32 `lax.conv_general_dilated(feature_group_count=C)` up to
fma reassociation; bf16 differs only by the final output rounding.

Reference parity anchor: torch `Conv2d(C, C, 3, stride=s, padding=1,
groups=C, bias=False)` (SURVEY.md §2.2; /root/reference mount empty —
see SURVEY provenance notice).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["depthwise_conv3x3", "depthwise_conv3x3_reference", "supports"]


def pack_factor(c: int) -> int:
    return 128 // math.gcd(c, 128)


def _pack(x: jax.Array):
    n, h, w, c = x.shape
    p = pack_factor(c)
    return x.reshape(n, h, w // p, p * c)


def _unpack(xp: jax.Array, c: int) -> jax.Array:
    n, h, g, l = xp.shape
    return xp.reshape(n, h, g * (l // c), c)


def _lane_weights(k33c: jax.Array, p: int) -> jax.Array:
    """(3,3,C) -> fp32 (9, P·C): row dh*3+dw holds k[dh,dw,:] tiled P×."""
    c = k33c.shape[-1]
    kf = k33c.astype(jnp.float32).reshape(9, 1, c)
    return jnp.broadcast_to(kf, (9, p, c)).reshape(9, p * c)


def _parity_selectors(g: int):
    """One-hot fp32 (G/2, G) selecting even / odd rows (exact on MXU)."""
    r = np.arange(g // 2)
    se = np.zeros((g // 2, g), np.float32)
    so = np.zeros((g // 2, g), np.float32)
    se[r, 2 * r] = 1.0
    so[r, 2 * r + 1] = 1.0
    return jnp.asarray(se), jnp.asarray(so)


def _shift_down(slab: jax.Array) -> jax.Array:
    """Rows g <- g-1; row 0 zero (W left border)."""
    return jnp.pad(slab, ((1, 0), (0, 0)))[:-1]


def _shift_up(slab: jax.Array) -> jax.Array:
    """Rows g <- g+1; last row zero (W right border)."""
    return jnp.pad(slab, ((0, 1), (0, 0)))[1:]


def _roll(slab: jax.Array, delta: int) -> jax.Array:
    if delta == 0:
        return slab
    return pltpu.roll(slab, delta % slab.shape[-1], 1)


def _zero_like(v, live):
    return jnp.where(live, v, jnp.zeros_like(v))


def _sel(sel_ref, j, slab):
    return jax.lax.dot(sel_ref[j], slab,
                       preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# tap plans
# ---------------------------------------------------------------------------


def _s2_tap_plan(p: int):
    """Forward stride 2: per dw, (source, m_src) per output position m'.
    source: 0 even group (2g'), 1 odd (2g'+1), 2 previous odd (2g'-1)."""
    plan = []
    for dw in range(3):
        taps = []
        for mp in range(p):
            w_rel = 2 * mp + dw - 1
            if w_rel < 0:
                taps.append((2, p + w_rel))
            elif w_rel < p:
                taps.append((0, w_rel))
            else:
                taps.append((1, w_rel - p))
        plan.append(taps)
    return plan


def _s2_dx_plan(p: int):
    """Backward-dx stride 2: per dx-group parity ρ and position m, the
    valid (dw, use_next_group, m_src): δ=1-dw with (P·ρ+m+δ) even, and
    u = (P·ρ+m+δ)/2, carrying to the next dy group when u == P.

    The parity condition must include the P·ρ term: for odd P (P=1,
    i.e. C a multiple of 128) the ρ=1 plan has opposite (m+δ) parity
    from ρ=0, and omitting it selects the wrong taps (advisor round-2
    high finding — dx err ~16 at C=128 before the fix, precision noise
    after; for even P the term is even and the condition is unchanged)."""
    plans = {}
    for rho in range(2):
        terms = []
        for m in range(p):
            for dw in range(3):
                delta = 1 - dw
                if (p * rho + m + delta) % 2:
                    continue
                u = (p * rho + m + delta) // 2
                terms.append((m, dw, u >= p, u % p))
        plans[rho] = terms
    return plans


def _build_tap(plan_dw, srcs, rolled, m_iota, cu):
    tap = None
    for mp, (s_id, m_src) in enumerate(plan_dw):
        key = (s_id, (mp - m_src) * cu)
        if key not in rolled:
            rolled[key] = _roll(srcs[s_id], key[1])
        v = rolled[key]
        tap = (jnp.where(m_iota == mp, v, tap) if tap is not None
               else jnp.where(m_iota == mp, v, jnp.zeros_like(v)))
    return tap


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------


def _make_s2_fwd(tm, g, l, cu, out_dtype):
    p = l // cu
    gp = g // 2
    plan = _s2_tap_plan(p)

    def kernel(xm_ref, xh_ref, kb_ref, sel_ref, y_ref):
        i = pl.program_id(1)
        m_iota = jax.lax.broadcasted_iota(jnp.int32, (gp, l), 1) // cu

        srcs_cache = {}

        def row_sources(lr):
            if lr in srcs_cache:
                return srcs_cache[lr]
            if lr < 0:
                slab = _zero_like(xh_ref[0, 0].astype(jnp.float32), i > 0)
            else:
                slab = xm_ref[0, lr].astype(jnp.float32)
            e0 = _sel(sel_ref, 0, slab)
            e1 = _sel(sel_ref, 1, slab)
            out = (e0, e1, _shift_down(e1))
            srcs_cache[lr] = out
            return out

        for t in range(tm):
            acc = jnp.zeros((gp, l), jnp.float32)
            for dh in range(3):
                srcs = row_sources(2 * t + dh - 1)
                rolled = {}
                for dw in range(3):
                    tap = _build_tap(plan[dw], srcs, rolled, m_iota, cu)
                    acc = acc + tap * kb_ref[dh * 3 + dw, :][None, :]
            y_ref[0, t] = acc.astype(out_dtype)

    return kernel


def _make_s1_fwd(tm, g, l, cu, out_dtype, nbands):

    def kernel(xm_ref, xt_ref, xb_ref, kb_ref, y_ref):
        i = pl.program_id(1)
        m_iota = jax.lax.broadcasted_iota(jnp.int32, (g, l), 1) // cu
        first = m_iota == 0
        last = m_iota == (l // cu) - 1

        def slab_at(lr):
            if lr < 0:
                return _zero_like(xt_ref[0, 0].astype(jnp.float32), i > 0)
            if lr >= tm:
                return _zero_like(xb_ref[0, 0].astype(jnp.float32),
                                  i < nbands - 1)
            return xm_ref[0, lr].astype(jnp.float32)

        for t in range(tm):
            acc = jnp.zeros((g, l), jnp.float32)
            for dh in range(3):
                a = slab_at(t + dh - 1)
                t0 = jnp.where(first, _roll(_shift_down(a), cu),
                               _roll(a, cu))                   # w-1
                t2 = jnp.where(last, _roll(_shift_up(a), -cu),
                               _roll(a, -cu))                  # w+1
                acc = (acc
                       + t0 * kb_ref[dh * 3 + 0, :][None, :]
                       + a * kb_ref[dh * 3 + 1, :][None, :]
                       + t2 * kb_ref[dh * 3 + 2, :][None, :])
            y_ref[0, t] = acc.astype(out_dtype)

    return kernel


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _make_s2_bwd_dx(tb, gp, l, cu, out_dtype, nbands):
    p = l // cu
    plans = _s2_dx_plan(p)

    def kernel(dy_ref, dyb_ref, kb_ref, selt_ref, dx_ref):
        i = pl.program_id(1)
        m_iota = jax.lax.broadcasted_iota(jnp.int32, (gp, l), 1) // cu

        def dy_slab(r):
            if r >= tb // 2:
                return _zero_like(dyb_ref[0, 0].astype(jnp.float32),
                                  i < nbands - 1)
            return dy_ref[0, r].astype(jnp.float32)

        for t in range(tb):
            dh_rows = ([(1, t // 2)] if t % 2 == 0
                       else [(0, (t + 1) // 2), (2, (t - 1) // 2)])
            acc = {0: jnp.zeros((gp, l), jnp.float32),
                   1: jnp.zeros((gp, l), jnp.float32)}
            for dh, r in dh_rows:
                d = dy_slab(r)
                dn = _shift_up(d)
                rolled = {}
                for rho in range(2):
                    for m, dw, use_next, m_src in plans[rho]:
                        key = (use_next, (m - m_src) * cu)
                        if key not in rolled:
                            rolled[key] = _roll(dn if use_next else d,
                                                key[1])
                        term = jnp.where(
                            m_iota == m,
                            rolled[key] * kb_ref[dh * 3 + dw, :][None, :],
                            0.0)
                        acc[rho] = acc[rho] + term
            merged = (_sel(selt_ref, 0, acc[0])
                      + _sel(selt_ref, 1, acc[1]))
            dx_ref[0, t] = merged.astype(out_dtype)

    return kernel


def _make_s2_bwd_dk(tm, g, l, cu):
    p = l // cu
    gp = g // 2
    plan = _s2_tap_plan(p)

    def kernel(xm_ref, xh_ref, dy_ref, sel_ref, dk_ref):
        nn = pl.program_id(0)
        i = pl.program_id(1)
        m_iota = jax.lax.broadcasted_iota(jnp.int32, (gp, l), 1) // cu

        @pl.when(jnp.logical_and(nn == 0, i == 0))
        def _():
            dk_ref[...] = jnp.zeros_like(dk_ref)

        srcs_cache = {}

        def row_sources(lr):
            if lr in srcs_cache:
                return srcs_cache[lr]
            if lr < 0:
                slab = _zero_like(xh_ref[0, 0].astype(jnp.float32), i > 0)
            else:
                slab = xm_ref[0, lr].astype(jnp.float32)
            e0 = _sel(sel_ref, 0, slab)
            e1 = _sel(sel_ref, 1, slab)
            out = (e0, e1, _shift_down(e1))
            srcs_cache[lr] = out
            return out

        for t in range(tm):
            dyt = dy_ref[0, t].astype(jnp.float32)
            for dh in range(3):
                srcs = row_sources(2 * t + dh - 1)
                rolled = {}
                for dw in range(3):
                    tap = _build_tap(plan[dw], srcs, rolled, m_iota, cu)
                    dk_ref[dh * 3 + dw, :] += jnp.sum(tap * dyt, axis=0)

    return kernel


def _make_s1_bwd_dk(tm, g, l, cu, nbands):

    def kernel(xm_ref, xt_ref, xb_ref, dy_ref, dk_ref):
        nn = pl.program_id(0)
        i = pl.program_id(1)
        m_iota = jax.lax.broadcasted_iota(jnp.int32, (g, l), 1) // cu
        first = m_iota == 0
        last = m_iota == (l // cu) - 1

        @pl.when(jnp.logical_and(nn == 0, i == 0))
        def _():
            dk_ref[...] = jnp.zeros_like(dk_ref)

        def slab_at(lr):
            if lr < 0:
                return _zero_like(xt_ref[0, 0].astype(jnp.float32), i > 0)
            if lr >= tm:
                return _zero_like(xb_ref[0, 0].astype(jnp.float32),
                                  i < nbands - 1)
            return xm_ref[0, lr].astype(jnp.float32)

        for t in range(tm):
            dyt = dy_ref[0, t].astype(jnp.float32)
            for dh in range(3):
                a = slab_at(t + dh - 1)
                taps = (
                    jnp.where(first, _roll(_shift_down(a), cu),
                              _roll(a, cu)),
                    a,
                    jnp.where(last, _roll(_shift_up(a), -cu),
                              _roll(a, -cu)),
                )
                for dw, tap in enumerate(taps):
                    dk_ref[dh * 3 + dw, :] += jnp.sum(tap * dyt, axis=0)

    return kernel


# ---------------------------------------------------------------------------
# pallas_call drivers
# ---------------------------------------------------------------------------


def _pick_tile(total: int, cap: int = 8, step: int = 1) -> int:
    tm = max(step, min(cap, total))
    while total % tm or tm % step:
        tm -= 1
    return tm


def _spec(block, imap):
    return pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)


def _dw_s2_fwd_call(xp, kb, cu, interpret):
    n, h, g, l = xp.shape
    hp, gp = h // 2, g // 2
    tm = _pick_tile(hp)
    se, so = _parity_selectors(g)
    sel = jnp.stack([se, so])
    kernel = _make_s2_fwd(tm, g, l, cu, xp.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, hp, gp, l), xp.dtype),
        grid=(n, hp // tm),
        in_specs=[
            _spec((1, 2 * tm, g, l), lambda nn, ii: (nn, ii, 0, 0)),
            _spec((1, 1, g, l),
                  lambda nn, ii: (nn, jnp.maximum(2 * tm * ii - 1, 0), 0, 0)),
            _spec(kb.shape, lambda nn, ii: (0, 0)),
            _spec(sel.shape, lambda nn, ii: (0, 0, 0)),
        ],
        out_specs=_spec((1, tm, gp, l), lambda nn, ii: (nn, ii, 0, 0)),
        interpret=interpret,
    )(xp, xp, kb, sel)


def _dw_s1_fwd_call(xp, kb, cu, interpret):
    n, h, g, l = xp.shape
    tm = _pick_tile(h)
    nbands = h // tm
    kernel = _make_s1_fwd(tm, g, l, cu, xp.dtype, nbands)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, g, l), xp.dtype),
        grid=(n, nbands),
        in_specs=[
            _spec((1, tm, g, l), lambda nn, ii: (nn, ii, 0, 0)),
            _spec((1, 1, g, l),
                  lambda nn, ii: (nn, jnp.maximum(tm * ii - 1, 0), 0, 0)),
            _spec((1, 1, g, l),
                  lambda nn, ii: (nn, jnp.minimum(tm * (ii + 1), h - 1),
                                  0, 0)),
            _spec(kb.shape, lambda nn, ii: (0, 0)),
        ],
        out_specs=_spec((1, tm, g, l), lambda nn, ii: (nn, ii, 0, 0)),
        interpret=interpret,
    )(xp, xp, xp, kb)


def _dw_s2_dx_call(dyp, kb, cu, interpret):
    n, hp, gp, l = dyp.shape
    h, g = hp * 2, gp * 2
    tb = _pick_tile(h, cap=8, step=2)
    nbands = h // tb
    se, so = _parity_selectors(g)
    selt = jnp.stack([se.T, so.T])          # (2, G, G/2) expansion
    kernel = _make_s2_bwd_dx(tb, gp, l, cu, dyp.dtype, nbands)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, g, l), dyp.dtype),
        grid=(n, nbands),
        in_specs=[
            _spec((1, tb // 2, gp, l), lambda nn, ii: (nn, ii, 0, 0)),
            _spec((1, 1, gp, l),
                  lambda nn, ii: (nn,
                                  jnp.minimum((tb // 2) * (ii + 1), hp - 1),
                                  0, 0)),
            _spec(kb.shape, lambda nn, ii: (0, 0)),
            _spec(selt.shape, lambda nn, ii: (0, 0, 0)),
        ],
        out_specs=_spec((1, tb, g, l), lambda nn, ii: (nn, ii, 0, 0)),
        interpret=interpret,
    )(dyp, dyp, kb, selt)


def _dw_s2_dk_call(xp, dyp, cu, interpret):
    n, h, g, l = xp.shape
    hp = h // 2
    tm = _pick_tile(hp)
    se, so = _parity_selectors(g)
    sel = jnp.stack([se, so])
    kernel = _make_s2_bwd_dk(tm, g, l, cu)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((9, l), jnp.float32),
        grid=(n, hp // tm),
        in_specs=[
            _spec((1, 2 * tm, g, l), lambda nn, ii: (nn, ii, 0, 0)),
            _spec((1, 1, g, l),
                  lambda nn, ii: (nn, jnp.maximum(2 * tm * ii - 1, 0), 0, 0)),
            _spec((1, tm, g // 2, l), lambda nn, ii: (nn, ii, 0, 0)),
            _spec(sel.shape, lambda nn, ii: (0, 0, 0)),
        ],
        out_specs=_spec((9, l), lambda nn, ii: (0, 0)),
        interpret=interpret,
    )(xp, xp, dyp, sel)


def _dw_s1_dk_call(xp, dyp, cu, interpret):
    n, h, g, l = xp.shape
    tm = _pick_tile(h)
    nbands = h // tm
    kernel = _make_s1_bwd_dk(tm, g, l, cu, nbands)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((9, l), jnp.float32),
        grid=(n, nbands),
        in_specs=[
            _spec((1, tm, g, l), lambda nn, ii: (nn, ii, 0, 0)),
            _spec((1, 1, g, l),
                  lambda nn, ii: (nn, jnp.maximum(tm * ii - 1, 0), 0, 0)),
            _spec((1, 1, g, l),
                  lambda nn, ii: (nn, jnp.minimum(tm * (ii + 1), h - 1),
                                  0, 0)),
            _spec((1, tm, g, l), lambda nn, ii: (nn, ii, 0, 0)),
        ],
        out_specs=_spec((9, l), lambda nn, ii: (0, 0)),
        interpret=interpret,
    )(xp, xp, xp, dyp)


def _fold_dk(dk9l: jax.Array, c: int, k_dtype) -> jax.Array:
    p = dk9l.shape[-1] // c
    return dk9l.reshape(3, 3, p, c).sum(axis=2).astype(k_dtype)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def supports(x_shape, stride: int, dilation: int = 1,
             dtype=jnp.bfloat16) -> bool:
    """Whether the packed kernel handles this depthwise conv."""
    if dilation != 1 or stride not in (1, 2):
        return False
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.bfloat16),
                                jnp.dtype(jnp.float32)):
        return False
    n, h, w, c = x_shape
    p = pack_factor(c)
    if w % p:
        return False
    if stride == 2:
        return h % 2 == 0 and (w // p) % 2 == 0
    return True


def _dw_fwd_impl(x, k33c, stride, interpret):
    c = x.shape[-1]
    kb = _lane_weights(k33c, pack_factor(c))
    xp = _pack(x)
    if stride == 2:
        yp = _dw_s2_fwd_call(xp, kb, c, interpret)
    else:
        yp = _dw_s1_fwd_call(xp, kb, c, interpret)
    return _unpack(yp, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _dw3x3(x, k33c, stride, interpret):
    return _dw_fwd_impl(x, k33c, stride, interpret)


def _dw3x3_fwd(x, k33c, stride, interpret):
    return _dw_fwd_impl(x, k33c, stride, interpret), (x, k33c)


def _dw3x3_bwd(stride, interpret, res, dy):
    x, k33c = res
    c = x.shape[-1]
    p = pack_factor(c)
    dyp = _pack(dy)
    xp = _pack(x)
    if stride == 1:
        kb_flip = _lane_weights(k33c[::-1, ::-1], p)
        dxp = _dw_s1_fwd_call(dyp, kb_flip, c, interpret)
        dk9 = _dw_s1_dk_call(xp, dyp, c, interpret)
    else:
        kb = _lane_weights(k33c, p)
        dxp = _dw_s2_dx_call(dyp, kb, c, interpret)
        dk9 = _dw_s2_dk_call(xp, dyp, c, interpret)
    return _unpack(dxp, c), _fold_dk(dk9, c, k33c.dtype)


_dw3x3.defvjp(_dw3x3_fwd, _dw3x3_bwd)


def depthwise_conv3x3(x: jax.Array, k: jax.Array, *, stride: int = 1,
                      interpret: bool = False) -> jax.Array:
    """Depthwise 3×3, padding 1, stride 1 or 2; differentiable (custom
    VJP with Pallas backward kernels). x NHWC bf16/fp32; k (3,3,C) or
    flax-style (3,3,1,C)."""
    if k.ndim == 4:
        k = k[:, :, 0, :]
    c = x.shape[-1]
    assert k.shape == (3, 3, c), (k.shape, c)
    assert supports(x.shape, stride, dtype=x.dtype), (x.shape, stride,
                                                      x.dtype)
    return _dw3x3(x, k, stride, interpret)


def depthwise_conv3x3_reference(x: jax.Array, k: jax.Array, *,
                                stride: int = 1) -> jax.Array:
    """lax oracle for tests/benchmarks."""
    if k.ndim == 3:
        k = k[:, :, None, :]
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


def routing_enabled() -> bool:
    """Model-level routing predicate (ops.conv.ConvBNAct) — **opt-in**
    (TPU_SEG_PALLAS_DW=1) after honest model-level measurement.

    Measured on v5e (scripts in /tmp mirrored by docs/FULLRES_ROOFLINE.md):
    standalone the kernels beat XLA 1.7x fwd / 1.5x fwd+bwd at the ds1
    shape (14.7 vs 25.5 ms, 24.9 vs 38.4 ms, b32 512x1024x32), but inside
    the jitted train step routing LOSES (242.7 -> 289.8 ms with ds1 alone
    routed): XLA assigns exotic internal layouts ({1,3,2,0}-style) to the
    surrounding tensors and a Mosaic custom call requires default layouts,
    so XLA inserts ~6.7 GB of relayout copies around the fwd+bwd calls
    (verified in the optimized HLO: copy.193/194/196/197/270-274). Until
    custom-call operands can carry layout constraints, in-graph routing is
    a net loss; the kernels remain correct, tested infrastructure and are
    a win when the caller controls the boundary layouts."""
    import os
    if os.environ.get("TPU_SEG_PALLAS_DW", "0") != "1":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
