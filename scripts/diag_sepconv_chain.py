"""Diagnostic: fused sepconv vs XLA composition with K calls chained INSIDE
one jit program — isolates device time from the axon tunnel's per-dispatch
floor (~1 ms/call), which masked the kernel's advantage in diag_sepconv."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from torch_semantic_segmentation_tpu.ops.pallas_sepconv import (
    _reference, fused_separable_conv)

K = 20  # layers chained inside one program


def timed(f, *args, n=10):
    out = f(*args)
    _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


CASES = [
    ("classifier b16 128x256 C128", 16, 128, 256, 128, 1),
    ("ffm-style  b16 128x256 C128 d4", 16, 128, 256, 128, 4),
]

for name, b, h, w, c, dil in CASES:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32)).astype(jnp.bfloat16)
    dwk = jnp.asarray(rng.normal(size=(3, 3, c)).astype(np.float32) * 0.2)
    dwb = jnp.zeros((c,), jnp.float32)
    pwk = jnp.asarray((rng.normal(size=(c, c)) * (0.5 / np.sqrt(c))).astype(np.float32)).astype(jnp.bfloat16)
    pwb = jnp.full((c,), 0.01, jnp.float32)

    def chain(fn):
        def run(x, dwk, dwb, pwk, pwb):
            for _ in range(K):
                x = fn(x, dwk, dwb, pwk, pwb)
            return x
        return jax.jit(run)

    ref = chain(lambda *a: _reference(*a, stride=1, dilation=dil,
                                      relu_mid=True, relu_out=True))
    fus = chain(lambda *a: fused_separable_conv(*a, dilation=dil,
                                                use_pallas=True))
    tr = timed(ref, x, dwk, dwb, pwk, pwb)
    tf = timed(fus, x, dwk, dwb, pwk, pwb)
    per_r, per_f = tr / K, tf / K
    gb_f = (2 * b * h * w * c * 2) / 1e9          # fused: in + out
    gb_r = (4 * b * h * w * c * 2) / 1e9          # unfused: + dw round-trip
    print(f"{name}: xla {per_r:.3f} ms/layer ({gb_r/per_r*1e3:.0f}GB/s)  "
          f"pallas {per_f:.3f} ms/layer ({gb_f/per_f*1e3:.0f}GB/s)  "
          f"{per_r/per_f:.2f}x", flush=True)
