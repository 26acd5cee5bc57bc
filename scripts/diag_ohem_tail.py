"""Diagnostic: fused-Pallas vs XLA resize-OHEM loss tail at the full-res
bench shape (1/8-res logits -> 1024x2048 labels) — value_and_grad wall
time, fetch-synced. Quantifies the round-3 OHEM map kernel
(ops/pallas_resize_ce.per_pixel_resize_ce routed from
losses.resize_ohem_cross_entropy)."""
import sys; sys.path.insert(0, "/root/repo")
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 40
H, W = 1024, 2048
rng = np.random.default_rng(0)
lbl = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)
logits = jnp.asarray(rng.normal(size=(B, H // 8, W // 8, 19)) * 2.0,
                     jnp.bfloat16)


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    _ = float(jnp.sum(leaf.astype(jnp.float32)))


def bench_compiled(c, *args, n=5):
    out = c(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = c(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / n


def run(tag):
    from torch_semantic_segmentation_tpu.losses import (
        resize_ohem_cross_entropy)
    f = jax.jit(jax.value_and_grad(
        lambda lg: resize_ohem_cross_entropy(lg, lbl, min_kept=100_000)))
    dt = bench_compiled(f, logits)
    print(f"{tag}: {dt * 1e3:.1f} ms  ({B / dt:.1f} img/s tail-only)")
    return f(logits)


os.environ["TPU_SEG_PALLAS_CE"] = "0"
v0, g0 = run("XLA   resize-OHEM v&g")
os.environ["TPU_SEG_PALLAS_CE"] = "1"
v1, g1 = run("Pallas resize-OHEM v&g")
print("value rel diff:", abs(float(v0) - float(v1)) / abs(float(v0)))
gd = np.abs(np.asarray(g0, np.float32) - np.asarray(g1, np.float32)).max()
print("grad max abs diff:", gd, " ref max:", np.abs(np.asarray(g0, np.float32)).max())
