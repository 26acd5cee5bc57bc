"""Diagnostic: which part of the Pallas sepconv kernel costs the time?

Times ablated kernel variants (chained in-jit, amortising the axon
dispatch floor): full kernel / no column rolls (wrong math, perf probe) /
dw taps only (no pw matmul) / DMA+copy only. Informs the planned rewrite
(module docstring of ops/pallas_sepconv.py): if the 9 `pltpu.roll`
relayouts dominate, a column-haloed-scratch rewrite has headroom; if the
floor is per-program overhead, bigger row tiles are the lever.
"""
import sys; sys.path.insert(0, "/root/repo")
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C = 16, 128, 256, 128
TH = int(__import__("os").environ.get("TH", "8"))
K = 20


def make_kernel(mode):
    def _kernel(x_hbm, dwk_ref, pwk_ref, out_ref, scratch, sems):
        ni = pl.program_id(0)
        hi = pl.program_id(1)
        row0 = hi * TH
        top0 = jnp.maximum(row0 - 1, 0)
        bot0 = jnp.minimum(row0 + TH, H - 1)
        cps = [pltpu.make_async_copy(x_hbm.at[ni, pl.ds(row0, TH)],
                                     scratch.at[pl.ds(1, TH)], sems.at[0]),
               pltpu.make_async_copy(x_hbm.at[ni, pl.ds(top0, 1)],
                                     scratch.at[pl.ds(0, 1)], sems.at[1]),
               pltpu.make_async_copy(x_hbm.at[ni, pl.ds(bot0, 1)],
                                     scratch.at[pl.ds(1 + TH, 1)], sems.at[2])]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        if mode == "dma":
            out_ref[0] = scratch[1:1 + TH]
            return
        col = jax.lax.broadcasted_iota(jnp.int32, (TH, W, C), 1)
        acc = jnp.zeros((TH, W, C), jnp.float32)
        for ti in range(3):
            rows = scratch[ti:ti + TH].astype(jnp.float32)
            for tj in range(3):
                o = tj - 1
                if mode == "noroll" or o == 0:
                    tap = rows
                else:
                    tap = pltpu.roll(rows, (-o) % W, axis=1)
                    tap = jnp.where(col < W - o, tap, 0.0) if o > 0 else \
                        jnp.where(col >= -o, tap, 0.0)
                acc = acc + tap * dwk_ref[ti, tj]
        mid = jnp.maximum(acc, 0.0)
        if mode == "dwonly":
            out_ref[0] = mid.astype(out_ref.dtype)
            return
        y = jnp.dot(mid.astype(out_ref.dtype).reshape(TH * W, C), pwk_ref[:],
                    preferred_element_type=jnp.float32)
        out_ref[0] = jnp.maximum(y, 0.0).reshape(TH, W, C).astype(out_ref.dtype)
    return _kernel


def build(mode):
    def one(x, dwk, pwk):
        return pl.pallas_call(
            make_kernel(mode),
            grid=(B, H // TH),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, TH, W, C), lambda ni, hi: (ni, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            scratch_shapes=[pltpu.VMEM((TH + 2, W, C), x.dtype),
                            pltpu.SemaphoreType.DMA((3,))],
        )(x, dwk, pwk)

    @jax.jit
    def chain(x, dwk, pwk):
        for _ in range(K):
            x = one(x, dwk, pwk)
        return x
    return chain


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32) * 0.1
                ).astype(jnp.bfloat16)
dwk = jnp.asarray(rng.normal(size=(3, 3, C)).astype(np.float32) * 0.1)
pwk = jnp.asarray((rng.normal(size=(C, C)) / np.sqrt(C) * 0.5
                   ).astype(np.float32)).astype(jnp.bfloat16)

gb = 2 * B * H * W * C * 2 / 1e9
for mode in ("dma", "noroll", "dwonly", "full"):
    f = build(mode)
    out = f(x, dwk, pwk)
    _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    out = f(x, dwk, pwk)
    _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
    per = (time.perf_counter() - t0) / K * 1e3
    print(f"{mode:>7s}: {per:.3f} ms/layer ({gb/per*1e3:.0f} GB/s eff)",
          flush=True)


# ---- experimental: cross-program double-buffered DMA (rewrite candidate) ----
# Program p starts band p+1's copies before computing band p; scratch and
# semaphores persist across grid steps on the core (pallas_guide double-
# buffer pattern), so the next band's HBM reads overlap this band's compute.

NB = H // TH
TOTAL = B * NB


def _dbuf_kernel(x_hbm, dwk_ref, pwk_ref, out_ref, scratch, sems):
    idx = pl.program_id(0)

    def start(slot, band):
        ni = band // NB
        hi = band % NB
        row0 = hi * TH
        top0 = jnp.maximum(row0 - 1, 0)
        bot0 = jnp.minimum(row0 + TH, H - 1)
        pltpu.make_async_copy(x_hbm.at[ni, pl.ds(row0, TH)],
                              scratch.at[slot, pl.ds(1, TH)],
                              sems.at[slot, 0]).start()
        pltpu.make_async_copy(x_hbm.at[ni, pl.ds(top0, 1)],
                              scratch.at[slot, pl.ds(0, 1)],
                              sems.at[slot, 1]).start()
        pltpu.make_async_copy(x_hbm.at[ni, pl.ds(bot0, 1)],
                              scratch.at[slot, pl.ds(1 + TH, 1)],
                              sems.at[slot, 2]).start()

    def wait(slot, band):
        ni = band // NB
        hi = band % NB
        row0 = hi * TH
        top0 = jnp.maximum(row0 - 1, 0)
        bot0 = jnp.minimum(row0 + TH, H - 1)
        pltpu.make_async_copy(x_hbm.at[ni, pl.ds(row0, TH)],
                              scratch.at[slot, pl.ds(1, TH)],
                              sems.at[slot, 0]).wait()
        pltpu.make_async_copy(x_hbm.at[ni, pl.ds(top0, 1)],
                              scratch.at[slot, pl.ds(0, 1)],
                              sems.at[slot, 1]).wait()
        pltpu.make_async_copy(x_hbm.at[ni, pl.ds(bot0, 1)],
                              scratch.at[slot, pl.ds(1 + TH, 1)],
                              sems.at[slot, 2]).wait()

    def compute(slot):
        hi = idx % NB
        band = scratch[slot]
        col = jax.lax.broadcasted_iota(jnp.int32, (TH, W, C), 1)
        row = jax.lax.broadcasted_iota(
            jnp.int32, (TH + 2, W, C), 0)  # halo-row zero masks
        top_bad = (hi == 0)
        bot_bad = (hi == NB - 1)
        acc = jnp.zeros((TH, W, C), jnp.float32)
        for ti in range(3):
            rows = band[ti:ti + TH].astype(jnp.float32)
            if ti == 0:
                rows = jnp.where(top_bad & (jax.lax.broadcasted_iota(
                    jnp.int32, (TH, W, C), 0) == 0), 0.0, rows)
            if ti == 2:
                rows = jnp.where(bot_bad & (jax.lax.broadcasted_iota(
                    jnp.int32, (TH, W, C), 0) == TH - 1), 0.0, rows)
            for tj in range(3):
                o = tj - 1
                if o == 0:
                    tap = rows
                else:
                    tap = pltpu.roll(rows, (-o) % W, axis=1)
                    tap = jnp.where(col < W - o, tap, 0.0) if o > 0 else \
                        jnp.where(col >= -o, tap, 0.0)
                acc = acc + tap * dwk_ref[ti, tj]
        mid = jnp.maximum(acc, 0.0)
        y = jnp.dot(mid.astype(out_ref.dtype).reshape(TH * W, C), pwk_ref[:],
                    preferred_element_type=jnp.float32)
        out_ref[0] = jnp.maximum(y, 0.0).reshape(TH, W, C).astype(out_ref.dtype)

    @pl.when(idx == 0)
    def _():
        start(0, 0)

    @pl.when(idx + 1 < TOTAL)
    def _():
        @pl.when(idx % 2 == 0)
        def _():
            start(1, idx + 1)

        @pl.when(idx % 2 == 1)
        def _():
            start(0, idx + 1)

    @pl.when(idx % 2 == 0)
    def _():
        wait(0, idx)
        compute(0)

    @pl.when(idx % 2 == 1)
    def _():
        wait(1, idx)
        compute(1)


def build_dbuf():
    def one(x, dwk, pwk):
        return pl.pallas_call(
            _dbuf_kernel,
            grid=(TOTAL,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (1, TH, W, C),
                lambda idx: (idx // NB, idx % NB, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            scratch_shapes=[pltpu.VMEM((2, TH + 2, W, C), x.dtype),
                            pltpu.SemaphoreType.DMA((2, 3))],
        )(x, dwk, pwk)

    @jax.jit
    def chain(x, dwk, pwk):
        for _ in range(K):
            x = one(x, dwk, pwk)
        return x
    return chain


f = build_dbuf()
out = f(x, dwk, pwk)
_ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
t0 = time.perf_counter()
out = f(x, dwk, pwk)
_ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
per = (time.perf_counter() - t0) / K * 1e3
print(f"   dbuf: {per:.3f} ms/layer ({gb/per*1e3:.0f} GB/s eff)", flush=True)

# correctness vs the plain full kernel (single application)
ref = build("full")
d = jnp.max(jnp.abs(ref(x, dwk, pwk).astype(jnp.float32)
                    - f(x, dwk, pwk).astype(jnp.float32)))
print(f"   dbuf maxdiff vs full-chain: {float(d):.5f}", flush=True)


# ---- baseline probes: Mosaic BlockSpec-pipelined copy vs XLA copy ----
def build_blockspec_copy():
    def _copy_kernel(x_ref, out_ref):
        out_ref[:] = x_ref[:]

    def one(x):
        return pl.pallas_call(
            _copy_kernel,
            grid=(B, H // TH),
            in_specs=[pl.BlockSpec((1, TH, W, C), lambda ni, hi: (ni, hi, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, TH, W, C), lambda ni, hi: (ni, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        )(x)

    @jax.jit
    def chain(x):
        for _ in range(K):
            x = one(x) + 0.0  # +0 keeps XLA from eliding the copies
        return x
    return chain


f = build_blockspec_copy()
out = f(x)
_ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
t0 = time.perf_counter()
out = f(x)
_ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
per = (time.perf_counter() - t0) / K * 1e3
print(f"bs-copy: {per:.3f} ms/layer ({gb/per*1e3:.0f} GB/s eff "
      f"[+epilogue add])", flush=True)


@jax.jit
def xla_roundtrip(x):
    for _ in range(K):
        x = x + jnp.bfloat16(1.0)  # pure HBM read+write per layer
    return x


out = xla_roundtrip(x)
_ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
t0 = time.perf_counter()
out = xla_roundtrip(x)
_ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
per = (time.perf_counter() - t0) / K * 1e3
print(f"xla-add: {per:.3f} ms/layer ({gb/per*1e3:.0f} GB/s)", flush=True)
