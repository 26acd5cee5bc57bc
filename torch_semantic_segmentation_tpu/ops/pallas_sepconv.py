"""Pallas TPU kernel: fused depthwise-separable conv (dw 3×3 → affine →
ReLU → pw 1×1 → affine → ReLU) for the folded-BN inference path.

Depthwise-separable convs are the hot op of the real-time zoo (FastSCNN /
ContextNet classifier & FFM stages — SURVEY.md §2.2 "Conv2D depthwise").
The unfused chain costs four full feature-map round-trips (dw read, dw
write, pw read, pw write); XLA does not fuse conv→conv, so this kernel
streams input row-bands HBM→VMEM once and writes only the final pointwise
output — two round-trips instead of four.

**Measured result (v5e, scripts/diag_sepconv_chain.py): OFF by default.**
With the axon per-dispatch floor amortised away (20 layers chained inside
one jit), XLA's unfused chain already runs at HBM speed-of-light
(~800 GB/s actual traffic rate), i.e. the 4-round-trip pipeline is
bandwidth-optimal end to end, while this kernel reaches ~170 GB/s. Net:
0.43–0.50× vs XLA. Ablation (scripts/diag_sepconv_parts.py) pins the
bottleneck: a DMA-only variant already runs at ~120 GB/s — the
serialized per-program copy pattern (start → wait → compute, no overlap
with the previous band's compute) caps the kernel; the rolls and the pw
matmul are NOT the problem (noroll ≈ full). The kernel is kept as
correct, tested infrastructure (exact match vs XLA and a torch oracle);
routing via `fuse_conv_pair` is gated behind TPU_SEG_FUSED_SEPCONV=1.
Rewrite attempts measured (same probe script): cross-program double
buffering (program i starts band i+1's DMA before computing band i —
verified exact) lifts it only to ~130 GB/s, larger row tiles change
nothing, and even a bare Mosaic BlockSpec-pipelined copy kernel caps at
~97 GB/s at these block shapes — the row-band streaming model itself
underperforms XLA's conv emitters on this platform, independent of the
kernel body. Conclusion: keep the XLA path as the default for this op
class; revisit only if Mosaic's HBM pipeline throughput improves.

Kernel design (pallas_guide.md patterns: Async DMA, grid pipelines):
- grid (N, H/TH): one program per image × output-row-band. The input stays
  in HBM (`memory_space=ANY`); each program issues three static-size async
  copies into a VMEM scratch band: the TH-row body plus d-row top/bottom
  halos. Halo starts are clamped to the array and the out-of-range rows
  are zeroed under `pl.when` (conv zero-padding semantics; no host-side
  pre-pad copy of the input, which would double HBM traffic).
- dw 3×3 (dilation d) on the VPU: nine shifted multiply-accumulates in
  fp32. Row taps are static sublane slices of the scratch band; column
  taps are `pltpu.roll` along W with an iota mask zeroing the borders.
- mid affine+ReLU in registers, then the pointwise conv as one MXU matmul
  (TH·W, C) @ (C, Co) with fp32 accumulation, out affine+ReLU, single
  write of the output band.

Training still uses the unfused ConvBNAct pair: BatchNorm batch statistics
need the materialised dw output, so this fusion is only valid once BN is
folded (ops.fold). `SeparableConv` routes here automatically after
`fold_batchnorm` on TPU (see ops.conv.SeparableConv.__call__).

Reference parity anchor: equals torch `Conv2d(groups=C) → Conv2d(1×1)` with
folded BN within fp32 tolerance (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(h: int, w: int, c: int, co: int, d: int,
               budget_bytes: int = 3 * 1024 * 1024) -> int | None:
    """Largest divisor TH of h whose fp32 working set fits the VMEM budget
    (scratch band + one fp32 temp + output block; Mosaic double-buffers the
    output block). None → caller falls back to the XLA path.

    TH must be ≥ d: the kernel's clamped halo DMAs only zero-fix the first
    and last band, so a band whose d-row halo reaches beyond its immediate
    neighbours (th < d) would read silently wrong rows."""
    for th in sorted((x for x in range(d, h + 1) if h % x == 0), reverse=True):
        band = (th + 2 * d) * w * c * 4
        work = th * w * max(c, co) * 4 * 2
        if band + work <= budget_bytes:
            return th
    return None


def _kernel(x_hbm, dwk_ref, dwb_ref, pwk_ref, pwb_ref, out_ref,
            scratch, sems, *, th: int, d: int, h: int,
            relu_mid: bool, relu_out: bool):
    ni = pl.program_id(0)
    hi = pl.program_id(1)
    row0 = hi * th

    # Body rows [row0, row0+th) → scratch[d:d+th]; halos with clamped
    # starts (always a valid static-size copy; garbage rows fixed below).
    top0 = jnp.maximum(row0 - d, 0)
    bot0 = jnp.minimum(row0 + th, h - d)
    body = pltpu.make_async_copy(x_hbm.at[ni, pl.ds(row0, th)],
                                 scratch.at[pl.ds(d, th)], sems.at[0])
    top = pltpu.make_async_copy(x_hbm.at[ni, pl.ds(top0, d)],
                                scratch.at[pl.ds(0, d)], sems.at[1])
    bot = pltpu.make_async_copy(x_hbm.at[ni, pl.ds(bot0, d)],
                                scratch.at[pl.ds(d + th, d)], sems.at[2])
    body.start()
    top.start()
    bot.start()
    body.wait()
    top.wait()
    bot.wait()

    @pl.when(hi == 0)
    def _():  # conv zero-padding above the first row
        scratch[0:d] = jnp.zeros_like(scratch[0:d])

    @pl.when(hi == pl.num_programs(1) - 1)
    def _():  # conv zero-padding below the last row
        scratch[d + th:] = jnp.zeros_like(scratch[d + th:])

    w = scratch.shape[1]
    c = scratch.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (th, w, c), 1)
    acc = jnp.zeros((th, w, c), jnp.float32)
    for ti in range(3):
        rows = scratch[ti * d:ti * d + th].astype(jnp.float32)
        for tj in range(3):
            o = (tj - 1) * d  # column tap offset
            tap = rows if o == 0 else pltpu.roll(rows, (-o) % w, axis=1)
            if o > 0:
                tap = jnp.where(col < w - o, tap, 0.0)
            elif o < 0:
                tap = jnp.where(col >= -o, tap, 0.0)
            acc = acc + tap * dwk_ref[ti, tj]
    mid = acc + dwb_ref[0]
    if relu_mid:
        mid = jnp.maximum(mid, 0.0)

    # pw matmul in the model dtype (bf16 MXU pass for bf16 models, fp32
    # exact for fp32 parity tests), fp32 accumulate — mirrors _reference
    y = jnp.dot(mid.astype(out_ref.dtype).reshape(th * w, c), pwk_ref[:],
                preferred_element_type=jnp.float32)
    y = y + pwb_ref[0]
    if relu_out:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.reshape(th, w, -1).astype(out_ref.dtype)


def _reference(x, dw_kernel, dw_bias, pw_kernel, pw_bias, *, stride, dilation,
               relu_mid, relu_out):
    """XLA composition (numerically identical semantics, fp32 accumulate):
    the fallback path and the parity oracle for the kernel tests."""
    c = x.shape[-1]
    dn = jax.lax.conv_dimension_numbers(x.shape, (3, 3, 1, c),
                                        ("NHWC", "HWIO", "NHWC"))
    pad = dilation * 1
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), dw_kernel.reshape(3, 3, 1, c).astype(jnp.float32),
        window_strides=(stride, stride), padding=((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation), dimension_numbers=dn,
        feature_group_count=c)
    y = y + dw_bias
    if relu_mid:
        y = jnp.maximum(y, 0.0)
    y = jnp.einsum("nhwc,cd->nhwd", y.astype(x.dtype), pw_kernel,
                   preferred_element_type=jnp.float32) + pw_bias
    if relu_out:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def fuse_conv_pair(dw, pw, x: jax.Array) -> jax.Array | None:
    """Route an eval-mode folded-BN (depthwise ConvBNAct, 1×1 ConvBNAct)
    pair through the fused kernel. Returns None when not applicable
    (not opted in — see module docstring, unfolded BN, PReLU,
    non-3×3/strided dw, non-relu acts, CPU backend) — callers fall back
    to `pw(dw(x))`. Used by SeparableConv and by models with an inline
    dw→1×1 pair (FastSCNN FFM)."""
    import os
    if os.environ.get("TPU_SEG_FUSED_SEPCONV", "0") != "1":
        return None  # measured slower than XLA's unfused chain; opt-in
    if dw.bn is not None or pw.bn is not None:
        return None  # BN not folded: batch stats need the dw output
    if jax.default_backend() != "tpu":
        return None
    if dw.act is not None or pw.act is not None:  # PReLU modules
        return None
    if dw._act_name not in (None, "identity", "relu"):
        return None
    if pw._act_name not in (None, "identity", "relu"):
        return None
    dwc, pwc = dw.conv, pw.conv
    c = x.shape[-1]
    d = dwc.kernel_dilation[0]
    if (tuple(dwc.kernel.shape) != (3, 3, 1, c)
            or dwc.strides != (1, 1)
            or dwc.kernel_dilation != (d, d)
            or dwc.padding != ((d, d), (d, d))
            or dwc.bias is None or pwc.bias is None):
        return None
    if (tuple(pwc.kernel.shape)[:2] != (1, 1) or pwc.strides != (1, 1)
            or pwc.kernel.shape[2] != c):
        return None
    return fused_separable_conv(
        x,
        dwc.kernel[...].reshape(3, 3, c),
        dwc.bias[...],
        pwc.kernel[...].reshape(c, -1).astype(x.dtype),
        pwc.bias[...],
        stride=1, dilation=d,
        relu_mid=dw._act_name == "relu",
        relu_out=pw._act_name == "relu",
    )


def fused_separable_conv(x: jax.Array, dw_kernel: jax.Array,
                         dw_bias: jax.Array, pw_kernel: jax.Array,
                         pw_bias: jax.Array, *, stride: int = 1,
                         dilation: int = 1, relu_mid: bool = True,
                         relu_out: bool = True,
                         use_pallas: bool | None = None) -> jax.Array:
    """Fused folded-BN depthwise-separable conv.

    x (N,H,W,C); dw_kernel (3,3,C) with its folded bias (C,); pw_kernel
    (C,Co) with folded bias (Co,). Returns (N,H',W',Co). The Pallas path
    covers stride 1 (any dilation); stride 2 falls back to the XLA
    composition. Inference only — fold BN first (ops.fold).
    """
    n, h, w, c = x.shape
    co = pw_kernel.shape[-1]
    interpret = jax.default_backend() != "tpu"
    if use_pallas is None:
        use_pallas = not interpret
    # Mosaic cannot DMA HBM row-band slices whose channel (lane) dim is not
    # a whole number of 128-lane tiles — gate the compiled path on C%128
    # (measured: C=64 fails tpu_compile, C=128 matches exactly).
    if not interpret and c % 128 != 0:
        use_pallas = False
    th = _pick_tile(h, w, c, co, dilation) if stride == 1 else None
    if not use_pallas or th is None or dilation * 1 >= h:
        return _reference(x, dw_kernel, dw_bias, pw_kernel, pw_bias,
                          stride=stride, dilation=dilation,
                          relu_mid=relu_mid, relu_out=relu_out)
    kern = functools.partial(_kernel, th=th, d=dilation, h=h,
                             relu_mid=relu_mid, relu_out=relu_out)
    return pl.pallas_call(
        kern,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dw kernel (3,3,C)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dw bias   (1,C)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pw kernel (C,Co)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pw bias   (1,Co)
        ],
        out_specs=pl.BlockSpec((1, th, w, co), lambda ni, hi: (ni, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * dilation, w, c), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(x, dw_kernel.astype(jnp.float32),
      dw_bias.reshape(1, -1).astype(jnp.float32), pw_kernel,
      pw_bias.reshape(1, -1).astype(jnp.float32))
