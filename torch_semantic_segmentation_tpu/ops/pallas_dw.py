"""Pallas TPU kernel: depthwise 3×3 convolution in W-packed layout.

Motivation (docs/FULLRES_ROOFLINE.md): XLA:TPU lowers the full-res
depthwise convs of the real-time zoo (FastSCNN LDS, ContextNet stems —
SURVEY.md §2.2 "Conv2D depthwise") through lane-padded layouts — any
(…, C)-minor tensor with C < 128 pads lanes to 128, so the 32-channel
half-res depthwise moves ~9× its minimum HBM bytes (12.1 GB measured vs
1.3 GB floor for ds1 at b32). Depthwise convs never mix channels, which
makes them expressible in a zero-padding packed layout using only the
Mosaic primitives this platform supports (probe results in the roofline
doc): strided ref reads, lane rolls, iota selects, pad/slice shifts.

Layout: NHWC (N, H, W, C) --pure reshape--> (N, H, G, L) where G = W/P,
L = P·C, lane ℓ = C·m + c for w = P·g + m; L is a multiple of 128 ⇒ no
lane padding anywhere and the reshape is free (same linear byte order).

Mosaic's strided vector loads/stores are 32-bit-only on this platform, so
for bf16 the packed array is additionally bitcast to uint32 *lane pairs*
(adjacent channels c=2c₂, 2c₂+1 share a word). All data movement — tap
rolls, m-selects, strided group reads — happens on the raw 32-bit
vectors (channel-pair space, unit C/2); only the multiply-accumulate
unpacks a word into two fp32 lanes (bf16 bits b ≡ f32 bits b<<16) and the
store packs two fp32 accumulators back with round-to-nearest-even. The
pack factor is chosen so the *32-bit* lane count is a multiple of 128:
P = 128/gcd(C_eff, 128) with C_eff = C/2 for bf16.

Per output row, a tap (dh, dw) needs x[s·h'+dh-1, s·w'+dw-1]:
- rows (dh): direct indexing of the row-band block (+1 halo row via a
  second BlockSpec whose index_map addresses row s·TH·i − 1, clamped and
  zero-masked at the image border);
- lanes (dw, stride 1): roll by ∓C_eff with the group-boundary lane
  taking the adjacent group's value (shift-down/up slab, iota select);
- lanes (dw, stride 2): out lane C_eff·m'+c draws from in lane
  C_eff·m_src+c of group 2g'+δ where 2m'+dw-1 = P·δ + m_src — assembled
  from the even / odd / previous-odd group slabs (strided ref reads)
  with P iota-selected rolls per tap.

Backward is custom-VJP with Pallas kernels: stride-1 dx is the forward
kernel with the flipped kernel; stride-2 dx is the lane-expansion map
(dy lane u = (P·ρ+m+1-dw)/2 feeds dx lane m of group parity ρ, the u=P
carry coming from the next group slab); dk accumulates per-tap
Σ taps(x)⊙dy into a (9·pairs, L) fp32 buffer revisited by every grid
step and is folded to (3,3,C) outside.

All arithmetic is fp32 on the VPU with a single packed store per output
row. Numerically exact vs fp32 `lax.conv_general_dilated` with
`feature_group_count=C` up to fma reassociation (for bf16 inputs the
taps are exact bf16→f32 upcasts; only the final store rounds).

Reference parity anchor: torch `Conv2d(C, C, 3, stride=s, padding=1,
groups=C, bias=False)` (SURVEY.md §2.2; /root/reference mount empty —
see SURVEY provenance notice).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["depthwise_conv3x3", "depthwise_conv3x3_reference", "supports"]


def _pack_factor(c: int, pair: bool) -> int:
    c_eff = c // 2 if pair else c
    return 128 // math.gcd(c_eff, 128)


def _pack(x: jax.Array, pair: bool):
    """NHWC -> (N, H, G, L_vec) raw-vector array (+ channel-unit cu).

    bf16: bitcast lane pairs to uint32 (free: same byte order)."""
    n, h, w, c = x.shape
    p = _pack_factor(c, pair)
    if pair:
        xp = jax.lax.bitcast_convert_type(
            x.reshape(n, h, w // p, p * c // 2, 2), jnp.uint32)
        return xp, c // 2
    return x.reshape(n, h, w // p, p * c), c


def _unpack(xp: jax.Array, c: int, pair: bool, dtype) -> jax.Array:
    n, h, g, le = xp.shape
    if pair:
        xb = jax.lax.bitcast_convert_type(xp, dtype)  # (..., le, 2)
        return xb.reshape(n, h, g * (2 * le // c), c)
    return xp.reshape(n, h, g * (le // c), c)


def _lane_weights(k33c: jax.Array, p: int, pair: bool) -> jax.Array:
    """(3,3,C) -> fp32 (9, P·C) or, paired, (18, P·C/2): rows 2j / 2j+1
    hold tap j's even / odd channels."""
    c = k33c.shape[-1]
    kf = k33c.astype(jnp.float32).reshape(9, 1, c)
    if pair:
        kf = kf.reshape(9, 1, c // 2, 2)
        kf = jnp.broadcast_to(kf, (9, p, c // 2, 2))
        kf = jnp.moveaxis(kf, -1, 1)  # (9, 2, p, c//2)
        return kf.reshape(18, p * c // 2)
    return jnp.broadcast_to(kf, (9, p, c)).reshape(9, p * c)


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


def _mk_math(pair: bool, out_dtype):
    """fma/store hooks over raw vectors; acc is a tuple of fp32 slabs."""
    if not pair:

        def zero(shape):
            return (jnp.zeros(shape, jnp.float32),)

        def fma(acc, tap, kb_ref, j):
            return (acc[0] + tap.astype(jnp.float32)
                    * kb_ref[j, :][None, :],)

        def store(acc):
            return acc[0].astype(out_dtype)

        def mulsum(tap, dy):  # per-lane Σ_rows tap·dy, rows list per tap j
            return (jnp.sum(tap.astype(jnp.float32)
                            * dy.astype(jnp.float32), axis=0),)

        return zero, fma, store, mulsum

    def unpk(v):
        lo = jax.lax.bitcast_convert_type(v << 16, jnp.float32)
        hi = jax.lax.bitcast_convert_type(v & jnp.uint32(0xFFFF0000),
                                          jnp.float32)
        return lo, hi

    def zero(shape):
        return (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))

    def fma(acc, tap, kb_ref, j):
        lo, hi = unpk(tap)
        return (acc[0] + lo * kb_ref[2 * j, :][None, :],
                acc[1] + hi * kb_ref[2 * j + 1, :][None, :])

    def _rne(f):
        b = jax.lax.bitcast_convert_type(f, jnp.uint32)
        return (b + jnp.uint32(0x7FFF) + ((b >> 16) & jnp.uint32(1))) >> 16

    def store(acc):
        return (_rne(acc[1]) << 16) | _rne(acc[0])

    def mulsum(tap, dy):
        tl, th = unpk(tap)
        dl, dh_ = unpk(dy)
        return (jnp.sum(tl * dl, axis=0), jnp.sum(th * dh_, axis=0))

    return zero, fma, store, mulsum


# ---------------------------------------------------------------------------
# tap plans (in channel-unit space; valid for plain and paired vectors)
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
    valid (dw, use_next_group, m_src): δ=1-dw with (m+δ) even, and
    u = (P·ρ+m+δ)/2, carrying to the next dy group when u == P."""
    plans = {}
    for rho in range(2):
        terms = []
        for m in range(p):
            for dw in range(3):
                delta = 1 - dw
                if (m + delta) % 2:
                    continue
                u = (p * rho + m + delta) // 2
                terms.append((m, dw, u >= p, u % p))
        plans[rho] = terms
    return plans


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------


def _make_s2_fwd(tm, gp, le, cu, pair, out_dtype):
    p = le // cu
    plan = _s2_tap_plan(p)
    zero, fma, store, _ = _mk_math(pair, out_dtype)

    def kernel(xm_ref, xh_ref, kb_ref, y_ref):
        i = pl.program_id(1)
        m_iota = jax.lax.broadcasted_iota(jnp.int32, (gp, le), 1) // cu

        def row_sources(lr):
            if lr < 0:
                e0 = _zero_like(xh_ref[0, 0, 0::2, :], i > 0)
                e1 = _zero_like(xh_ref[0, 0, 1::2, :], i > 0)
            else:
                e0 = xm_ref[0, lr, 0::2, :]
                e1 = xm_ref[0, lr, 1::2, :]
            return e0, e1, _shift_down(e1)

        for t in range(tm):
            acc = zero((gp, le))
            for dh in range(3):
                srcs = row_sources(2 * t + dh - 1)
                rolled = {}
                for dw in range(3):
                    tap = None
                    for mp, (s_id, m_src) in enumerate(plan[dw]):
                        key = (s_id, (mp - m_src) * cu)
                        if key not in rolled:
                            rolled[key] = _roll(srcs[s_id], key[1])
                        v = rolled[key]
                        tap = (jnp.where(m_iota == mp, v, tap)
                               if tap is not None else
                               jnp.where(m_iota == mp, v, jnp.zeros_like(v)))
                    acc = fma(acc, tap, kb_ref, dh * 3 + dw)
            y_ref[0, t] = store(acc)

    return kernel


def _make_s1_fwd(tm, g, le, cu, pair, out_dtype, nbands):
    zero, fma, store, _ = _mk_math(pair, out_dtype)

    def kernel(xm_ref, xt_ref, xb_ref, kb_ref, y_ref):
        i = pl.program_id(1)
        m_iota = jax.lax.broadcasted_iota(jnp.int32, (g, le), 1) // cu
        first = m_iota == 0
        last = m_iota == (le // cu) - 1

        def slab_at(lr):
            if lr < 0:
                return _zero_like(xt_ref[0, 0], i > 0)
            if lr >= tm:
                return _zero_like(xb_ref[0, 0], i < nbands - 1)
            return xm_ref[0, lr]

        for t in range(tm):
            acc = zero((g, le))
            for dh in range(3):
                a = slab_at(t + dh - 1)
                t0 = jnp.where(first, _roll(_shift_down(a), cu),
                               _roll(a, cu))                   # w-1
                t2 = jnp.where(last, _roll(_shift_up(a), -cu),
                               _roll(a, -cu))                  # w+1
                acc = fma(acc, t0, kb_ref, dh * 3 + 0)
                acc = fma(acc, a, kb_ref, dh * 3 + 1)
                acc = fma(acc, t2, kb_ref, dh * 3 + 2)
            y_ref[0, t] = store(acc)

    return kernel


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _make_s2_bwd_dx(tb, gp, le, cu, pair, out_dtype, g_full, nbands):
    p = le // cu
    plans = _s2_dx_plan(p)
    zero, fma, store, _ = _mk_math(pair, out_dtype)

    def kernel(dy_ref, dyb_ref, kb_ref, dx_ref):
        i = pl.program_id(1)
        m_iota = jax.lax.broadcasted_iota(jnp.int32, (gp, le), 1) // cu

        def dy_slab(r):
            if r >= tb // 2:
                return _zero_like(dyb_ref[0, 0], i < nbands - 1)
            return dy_ref[0, r]

        for t in range(tb):
            dh_rows = ([(1, t // 2)] if t % 2 == 0
                       else [(0, (t + 1) // 2), (2, (t - 1) // 2)])
            acc = {0: zero((gp, le)), 1: zero((gp, le))}
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
                        masked = jnp.where(m_iota == m, rolled[key],
                                           jnp.zeros_like(rolled[key]))
                        acc[rho] = fma(acc[rho], masked, kb_ref,
                                       dh * 3 + dw)
            for rho in range(2):
                dx_ref[0, t * g_full + rho:(t + 1) * g_full:2, :] = (
                    store(acc[rho]))

    return kernel


def _make_s2_bwd_dk(tm, gp, le, cu, pair):
    p = le // cu
    plan = _s2_tap_plan(p)
    _, _, _, mulsum = _mk_math(pair, None)
    rows_per_tap = 2 if pair else 1

    def kernel(xm_ref, xh_ref, dy_ref, dk_ref):
        nn = pl.program_id(0)
        i = pl.program_id(1)
        m_iota = jax.lax.broadcasted_iota(jnp.int32, (gp, le), 1) // cu

        @pl.when(jnp.logical_and(nn == 0, i == 0))
        def _():
            dk_ref[...] = jnp.zeros_like(dk_ref)

        def row_sources(lr):
            if lr < 0:
                e0 = _zero_like(xh_ref[0, 0, 0::2, :], i > 0)
                e1 = _zero_like(xh_ref[0, 0, 1::2, :], i > 0)
            else:
                e0 = xm_ref[0, lr, 0::2, :]
                e1 = xm_ref[0, lr, 1::2, :]
            return e0, e1, _shift_down(e1)

        for t in range(tm):
            dyt = dy_ref[0, t]
            for dh in range(3):
                srcs = row_sources(2 * t + dh - 1)
                rolled = {}
                for dw in range(3):
                    tap = None
                    for mp, (s_id, m_src) in enumerate(plan[dw]):
                        key = (s_id, (mp - m_src) * cu)
                        if key not in rolled:
                            rolled[key] = _roll(srcs[s_id], key[1])
                        v = rolled[key]
                        tap = (jnp.where(m_iota == mp, v, tap)
                               if tap is not None else
                               jnp.where(m_iota == mp, v, jnp.zeros_like(v)))
                    parts = mulsum(tap, dyt)
                    j = dh * 3 + dw
                    for par, val in enumerate(parts):
                        dk_ref[rows_per_tap * j + par, :] += val

    return kernel


def _make_s1_bwd_dk(tm, g, le, cu, pair, nbands):
    _, _, _, mulsum = _mk_math(pair, None)
    rows_per_tap = 2 if pair else 1

    def kernel(xm_ref, xt_ref, xb_ref, dy_ref, dk_ref):
        nn = pl.program_id(0)
        i = pl.program_id(1)
        m_iota = jax.lax.broadcasted_iota(jnp.int32, (g, le), 1) // cu
        first = m_iota == 0
        last = m_iota == (le // cu) - 1

        @pl.when(jnp.logical_and(nn == 0, i == 0))
        def _():
            dk_ref[...] = jnp.zeros_like(dk_ref)

        def slab_at(lr):
            if lr < 0:
                return _zero_like(xt_ref[0, 0], i > 0)
            if lr >= tm:
                return _zero_like(xb_ref[0, 0], i < nbands - 1)
            return xm_ref[0, lr]

        for t in range(tm):
            dyt = dy_ref[0, t]
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
                    parts = mulsum(tap, dyt)
                    j = dh * 3 + dw
                    for par, val in enumerate(parts):
                        dk_ref[rows_per_tap * j + par, :] += val

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


def _dw_s2_fwd_call(xp, kb, cu, pair, out_dtype, interpret):
    n, h, g, le = xp.shape
    hp, gp = h // 2, g // 2
    tm = _pick_tile(hp)
    kernel = _make_s2_fwd(tm, gp, le, cu, pair, out_dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, hp, gp, le), xp.dtype),
        grid=(n, hp // tm),
        in_specs=[
            _spec((1, 2 * tm, g, le), lambda nn, ii: (nn, ii, 0, 0)),
            _spec((1, 1, g, le),
                  lambda nn, ii: (nn, jnp.maximum(2 * tm * ii - 1, 0), 0, 0)),
            _spec(kb.shape, lambda nn, ii: (0, 0)),
        ],
        out_specs=_spec((1, tm, gp, le), lambda nn, ii: (nn, ii, 0, 0)),
        interpret=interpret,
    )(xp, xp, kb)


def _dw_s1_fwd_call(xp, kb, cu, pair, out_dtype, interpret):
    n, h, g, le = xp.shape
    tm = _pick_tile(h)
    nbands = h // tm
    kernel = _make_s1_fwd(tm, g, le, cu, pair, out_dtype, nbands)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, g, le), xp.dtype),
        grid=(n, nbands),
        in_specs=[
            _spec((1, tm, g, le), lambda nn, ii: (nn, ii, 0, 0)),
            _spec((1, 1, g, le),
                  lambda nn, ii: (nn, jnp.maximum(tm * ii - 1, 0), 0, 0)),
            _spec((1, 1, g, le),
                  lambda nn, ii: (nn, jnp.minimum(tm * (ii + 1), h - 1),
                                  0, 0)),
            _spec(kb.shape, lambda nn, ii: (0, 0)),
        ],
        out_specs=_spec((1, tm, g, le), lambda nn, ii: (nn, ii, 0, 0)),
        interpret=interpret,
    )(xp, xp, xp, kb)


def _dw_s2_dx_call(dyp, kb, cu, pair, out_dtype, interpret):
    n, hp, gp, le = dyp.shape
    h, g = hp * 2, gp * 2
    tb = _pick_tile(h, cap=8, step=2)
    nbands = h // tb
    kernel = _make_s2_bwd_dx(tb, gp, le, cu, pair, out_dtype, g, nbands)
    dxf = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h * g, le), dyp.dtype),
        grid=(n, nbands),
        in_specs=[
            _spec((1, tb // 2, gp, le), lambda nn, ii: (nn, ii, 0, 0)),
            _spec((1, 1, gp, le),
                  lambda nn, ii: (nn,
                                  jnp.minimum((tb // 2) * (ii + 1), hp - 1),
                                  0, 0)),
            _spec(kb.shape, lambda nn, ii: (0, 0)),
        ],
        out_specs=_spec((1, tb * g, le), lambda nn, ii: (nn, ii, 0)),
        interpret=interpret,
    )(dyp, dyp, kb)
    return dxf.reshape(n, h, g, le)


def _dw_s2_dk_call(xp, dyp, cu, pair, interpret):
    n, h, g, le = xp.shape
    hp, gp = h // 2, g // 2
    tm = _pick_tile(hp)
    kernel = _make_s2_bwd_dk(tm, gp, le, cu, pair)
    rows = 18 if pair else 9
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, le), jnp.float32),
        grid=(n, hp // tm),
        in_specs=[
            _spec((1, 2 * tm, g, le), lambda nn, ii: (nn, ii, 0, 0)),
            _spec((1, 1, g, le),
                  lambda nn, ii: (nn, jnp.maximum(2 * tm * ii - 1, 0), 0, 0)),
            _spec((1, tm, gp, le), lambda nn, ii: (nn, ii, 0, 0)),
        ],
        out_specs=_spec((rows, le), lambda nn, ii: (0, 0)),
        interpret=interpret,
    )(xp, xp, dyp)


def _dw_s1_dk_call(xp, dyp, cu, pair, interpret):
    n, h, g, le = xp.shape
    tm = _pick_tile(h)
    nbands = h // tm
    kernel = _make_s1_bwd_dk(tm, g, le, cu, pair, nbands)
    rows = 18 if pair else 9
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, le), jnp.float32),
        grid=(n, nbands),
        in_specs=[
            _spec((1, tm, g, le), lambda nn, ii: (nn, ii, 0, 0)),
            _spec((1, 1, g, le),
                  lambda nn, ii: (nn, jnp.maximum(tm * ii - 1, 0), 0, 0)),
            _spec((1, 1, g, le),
                  lambda nn, ii: (nn, jnp.minimum(tm * (ii + 1), h - 1),
                                  0, 0)),
            _spec((1, tm, g, le), lambda nn, ii: (nn, ii, 0, 0)),
        ],
        out_specs=_spec((rows, le), lambda nn, ii: (0, 0)),
        interpret=interpret,
    )(xp, xp, xp, dyp)


def _fold_dk(dk: jax.Array, c: int, pair: bool, k_dtype) -> jax.Array:
    if pair:
        le = dk.shape[-1]
        p = 2 * le // c
        d = dk.reshape(9, 2, p, c // 2)          # (tap, parity, m, c2)
        d = jnp.moveaxis(d, 1, -1)               # (tap, m, c2, parity)
        return d.sum(axis=1).reshape(3, 3, c).astype(k_dtype)
    p = dk.shape[-1] // c
    return dk.reshape(3, 3, p, c).sum(axis=2).astype(k_dtype)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def supports(x_shape, stride: int, dilation: int = 1,
             dtype=jnp.bfloat16) -> bool:
    """Whether the packed kernel handles this depthwise conv."""
    if dilation != 1 or stride not in (1, 2):
        return False
    n, h, w, c = x_shape
    pair = jnp.dtype(dtype) == jnp.bfloat16
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.bfloat16),
                                jnp.dtype(jnp.float32)):
        return False
    if pair and c % 2:
        return False
    p = _pack_factor(c, pair)
    if w % p:
        return False
    if stride == 2:
        return h % 2 == 0 and (w // p) % 2 == 0
    return True


def _dw_fwd_impl(x, k33c, stride, interpret):
    c = x.shape[-1]
    pair = x.dtype == jnp.bfloat16
    p = _pack_factor(c, pair)
    kb = _lane_weights(k33c, p, pair)
    xp, cu = _pack(x, pair)
    if stride == 2:
        yp = _dw_s2_fwd_call(xp, kb, cu, pair, xp.dtype, interpret)
    else:
        yp = _dw_s1_fwd_call(xp, kb, cu, pair, xp.dtype, interpret)
    return _unpack(yp, c, pair, x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _dw3x3(x, k33c, stride, interpret):
    return _dw_fwd_impl(x, k33c, stride, interpret)


def _dw3x3_fwd(x, k33c, stride, interpret):
    return _dw_fwd_impl(x, k33c, stride, interpret), (x, k33c)


def _dw3x3_bwd(stride, interpret, res, dy):
    x, k33c = res
    c = x.shape[-1]
    pair = x.dtype == jnp.bfloat16
    p = _pack_factor(c, pair)
    dyp, cu = _pack(dy, pair)
    xp, _ = _pack(x, pair)
    if stride == 1:
        kb_flip = _lane_weights(k33c[::-1, ::-1], p, pair)
        dxp = _dw_s1_fwd_call(dyp, kb_flip, cu, pair, dyp.dtype, interpret)
        dk = _dw_s1_dk_call(xp, dyp, cu, pair, interpret)
    else:
        kb = _lane_weights(k33c, p, pair)
        dxp = _dw_s2_dx_call(dyp, kb, cu, pair, dyp.dtype, interpret)
        dk = _dw_s2_dk_call(xp, dyp, cu, pair, interpret)
    return (_unpack(dxp, c, pair, x.dtype),
            _fold_dk(dk, c, pair, k33c.dtype))


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
