"""Probe: Mosaic HBM streaming bandwidth vs block size — is the r1 sepconv
finding (~100-170 GB/s row-band cap) a property of SMALL blocks, or of the
platform? Chained copy kernels over a 1 GB array, fetch-synced once."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, W = 16384, 16384  # bf16: 512 MB
x0 = jnp.zeros((ROWS, W), jnp.bfloat16)


def copy_kernel(i_ref, o_ref):
    o_ref[:] = i_ref[:]


def make_copy(tr, tc):
    return lambda x: pl.pallas_call(
        copy_kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, W), x.dtype),
        grid=(ROWS // tr, W // tc),
        in_specs=[pl.BlockSpec((tr, tc), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tr, tc), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(x)


def bench(name, f, n=4):
    x = x0
    x = f(x)
    _ = float(jnp.sum(x[:1, :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
    _ = float(jnp.sum(x[:1, :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n
    gb = 2 * x0.size * 2 / 1e9  # read + write
    print(f"{name}: {dt*1e3:7.1f} ms  {gb/dt:5.0f} GB/s", flush=True)


bench("xla copy (reshape+neg)  ", jax.jit(lambda x: -x))
for tr, tc in ((256, 2048), (512, 2048), (1024, 2048), (256, 4096),
               (512, 4096), (1024, 4096), (2048, 4096), (512, 8192),
               (1024, 8192), (8, 16384), (64, 16384), (256, 16384)):
    vmem_mb = tr * tc * 2 * 2 * 2 / 1e6  # in+out, double-buffered
    if vmem_mb > 100:
        continue
    try:
        bench(f"pallas copy ({tr:5d},{tc:5d}) {vmem_mb:5.1f}MB",
              jax.jit(make_copy(tr, tc)))
    except Exception as e:
        print(f"pallas copy ({tr},{tc}): FAIL {str(e)[:80]}", flush=True)
