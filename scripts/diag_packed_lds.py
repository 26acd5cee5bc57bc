"""Measure the whole-LDS packed region (ops/packed_lds.py) vs the NHWC
path on TPU: LDS-only fwd+bwd walltime and bytes, then the full FastSCNN
train step both ways. Usage: python scripts/diag_packed_lds.py [b] [steps]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from flax import nnx

from torch_semantic_segmentation_tpu.models.fastscnn import (
    LearningToDownsample)
from torch_semantic_segmentation_tpu.ops import packed_lds

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
H, W = 1024, 2048


def bench(fn, *args, steps=STEPS):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))   # compile+sync (value fetch)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    s = float(jnp.sum(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - t0) / steps
    ca = jax.jit(fn).lower(*args).compile().cost_analysis() or {}
    gb = float(ca.get("bytes accessed", 0.0)) / 1e9
    return dt, gb, s


def main():
    lds = LearningToDownsample(3, (32, 48, 64), dtype=jnp.bfloat16,
                               rngs=nnx.Rngs(0))
    lds.eval()   # running-stat updates off so fwd is pure
    graphdef, state = nnx.split(lds)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, H, W, 3)),
                    jnp.bfloat16)

    def fwd_ref(state, x):
        m = nnx.merge(graphdef, state)
        return m.ds2(m.ds1(m.conv(x)))

    def fwd_pk(state, x):
        m = nnx.merge(graphdef, state)
        return packed_lds.lds_forward(m, x)

    def fb(fwd):
        def loss(state, x):
            return jnp.sum(fwd(state, x).astype(jnp.float32) ** 2)
        g = jax.grad(loss)
        return jax.jit(lambda s, x: (loss(s, x), g(s, x)))

    for name, fwd in (("ref", fwd_ref), ("packed", fwd_pk)):
        jf = jax.jit(fwd)
        dt, gb, _ = bench(jf, state, x)
        print(f"LDS fwd  {name:7s} b{B}: {dt * 1e3:8.2f} ms  {gb:7.2f} GB "
              f"({gb / dt:6.1f} GB/s)")
    for name, fwd in (("ref", fwd_ref), ("packed", fwd_pk)):
        jfb = fb(fwd)
        dt, gb, _ = bench(jfb, state, x)
        print(f"LDS f+b  {name:7s} b{B}: {dt * 1e3:8.2f} ms  {gb:7.2f} GB "
              f"({gb / dt:6.1f} GB/s)")


if __name__ == "__main__":
    main()
