"""Diagnostic: fused Pallas separable conv vs XLA composition on TPU
(honest value-fetch timing; shapes from the FastSCNN classifier and
UNet-style decoder stages)."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from torch_semantic_segmentation_tpu.ops.pallas_sepconv import (
    _reference, fused_separable_conv)


def timed(f, *args, n=100):
    out = f(*args)
    _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


CASES = [
    ("classifier b16 128x256 C128", 16, 128, 256, 128, 128, 1),
    ("classifier b64 128x128 C128", 64, 128, 128, 128, 128, 1),
    ("ffm-style  b16 128x256 C128 d4", 16, 128, 256, 128, 128, 4),
    ("decoder    b8  256x512 C64", 8, 256, 512, 64, 64, 1),
]

for name, b, h, w, c, co, dil in CASES:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32)).astype(jnp.bfloat16)
    dwk = jnp.asarray(rng.normal(size=(3, 3, c)).astype(np.float32) * 0.2)
    dwb = jnp.zeros((c,), jnp.float32)
    pwk = jnp.asarray(rng.normal(size=(c, co)).astype(np.float32) * 0.2).astype(jnp.bfloat16)
    pwb = jnp.zeros((co,), jnp.float32)

    ref = jax.jit(lambda x, a, b_, p, q: _reference(
        x, a, b_, p, q, stride=1, dilation=dil, relu_mid=True, relu_out=True))
    fus = jax.jit(lambda x, a, b_, p, q: fused_separable_conv(
        x, a, b_, p, q, dilation=dil, use_pallas=True))

    # correctness spot-check on device
    d = jnp.max(jnp.abs(ref(x, dwk, dwb, pwk, pwb).astype(jnp.float32)
                        - fus(x, dwk, dwb, pwk, pwb).astype(jnp.float32)))
    tr = timed(ref, x, dwk, dwb, pwk, pwb)
    tf = timed(fus, x, dwk, dwb, pwk, pwb)
    gb = (x.nbytes + b * h * w * co * 2) / 1e9
    print(f"{name}: xla {tr:.2f} ms  pallas {tf:.2f} ms  "
          f"({tr/tf:.2f}x; min-traffic {gb:.2f}GB -> {gb/tf*1e3:.0f}GB/s) "
          f"maxdiff {float(d):.4f}", flush=True)
