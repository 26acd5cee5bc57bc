"""Probe: Mosaic support + speed for lane-dim stride-2 extraction and lane
rolls — the primitive every stride-2 full-res Pallas conv kernel needs."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, W = 4096, 2048  # rows, lanes


def _fetch(out):
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))


def report(name, f, *args, n=10):
    try:
        c = jax.jit(f).lower(*args).compile()
        out = c(*args)
        _fetch(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = c(*args)
        _fetch(out)
        dt = (time.perf_counter() - t0) / n
        nb = sum(a.size * a.dtype.itemsize for a in args) + \
            sum(o.size * o.dtype.itemsize for o in jax.tree.leaves(out))
        print(f"{name}: {dt*1e3:7.2f} ms  {nb/dt/1e9:5.0f} GB/s(logical)",
              flush=True)
        return out
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)
        return None


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(M, W)), jnp.bfloat16)

TM = 256


def k_even(x_ref, o_ref):
    o_ref[:] = x_ref[:][:, ::2]


def k_reshape(x_ref, o_ref):
    v = x_ref[:]
    o_ref[:] = v.reshape(v.shape[0], v.shape[1] // 2, 2)[:, :, 0]


def k_roll(x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], 1, 1)


def k_copy(x_ref, o_ref):
    o_ref[:] = x_ref[:]


def run(kern, out_w, name):
    f = lambda x: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, out_w), x.dtype),
        grid=(M // TM,),
        in_specs=[pl.BlockSpec((TM, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TM, out_w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x)
    out = report(name, f, x)
    return out


o = run(k_copy, W, "copy           ")
o = run(k_even, W // 2, "lane ::2       ")
if o is not None:
    ref = np.asarray(x, np.float32)[:, ::2]
    print("  correct:", np.allclose(np.asarray(o, np.float32), ref), flush=True)
o = run(k_reshape, W // 2, "reshape-sel    ")
o = run(k_roll, W, "pltpu.roll 1   ")

# strided store probe: write even lanes of output
def k_scatter_even(x_ref, o_ref):
    o_ref[:, ::2] = x_ref[:][:, : W // 2]
    o_ref[:, 1::2] = x_ref[:][:, W // 2:]

o = run(k_scatter_even, W, "interleave-st  ")
if o is not None:
    xn = np.asarray(x, np.float32)
    ref = np.zeros((M, W), np.float32)
    ref[:, ::2] = xn[:, : W // 2]
    ref[:, 1::2] = xn[:, W // 2:]
    print("  correct:", np.allclose(np.asarray(o, np.float32), ref), flush=True)

# sublane stride-2 (second-minor) probe
def k_sub_even(x_ref, o_ref):
    o_ref[:] = x_ref[:][::2, :]

f = lambda x: pl.pallas_call(
    k_sub_even,
    out_shape=jax.ShapeDtypeStruct((M // 2, W), x.dtype),
    grid=(M // TM,),
    in_specs=[pl.BlockSpec((TM, W), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((TM // 2, W), lambda i: (i, 0),
                           memory_space=pltpu.VMEM),
)(x)
report("sublane ::2    ", f, x)
