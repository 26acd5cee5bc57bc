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
TH = 8
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
