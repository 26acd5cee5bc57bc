"""Isolated timing of the resize+CE training tail on the real chip:
XLA lane-major path vs the fused Pallas kernel (ops/pallas_resize_ce.py),
value_and_grad at the bench shape (b40, 1/8-res logits -> 1024x2048 CE).

Usage: JAX_PLATFORMS=axon python scripts/diag_resize_ce.py [batch]
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

from torch_semantic_segmentation_tpu.losses import resize_cross_entropy_loss
from torch_semantic_segmentation_tpu.ops import pallas_resize_ce as prce


def timed(fn, *args, steps=20):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])     # compile + fetch-sync
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / steps


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(b, 128, 256, 19)), jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, 19, (b, 1024, 2048)), jnp.int32)

    # tiny compiled smoke first (fails fast if Mosaic rejects the kernel)
    sl = jnp.asarray(rng.normal(size=(2, 8, 16, 19)), jnp.bfloat16)
    sy = jnp.asarray(rng.integers(0, 19, (2, 64, 128)), jnp.int32)
    v, g = jax.jit(jax.value_and_grad(prce.resize_cross_entropy))(sl, sy)
    print(f"smoke: loss={float(v):.4f} |g|={float(jnp.abs(g).max()):.2e}")

    xla = jax.jit(jax.value_and_grad(
        lambda lg, lb: resize_cross_entropy_loss(lg, lb)))
    fused = jax.jit(jax.value_and_grad(
        lambda lg, lb: prce.resize_cross_entropy(lg, lb)))

    os.environ["TPU_SEG_PALLAS_CE"] = "0"   # keep the XLA fn un-routed
    dt_x = timed(xla, logits, labels)
    dt_p = timed(fused, logits, labels)
    vx, gx = xla(logits, labels)
    vp, gp = fused(logits, labels)
    print(f"b{b} value_and_grad: xla {dt_x * 1e3:.2f} ms | "
          f"pallas {dt_p * 1e3:.2f} ms | speedup {dt_x / dt_p:.2f}x")
    print(f"loss xla {float(vx):.5f} pallas {float(vp):.5f}; "
          f"grad maxdiff {float(jnp.abs(gx - gp).max()):.3e} "
          f"(ref max {float(jnp.abs(gx).max()):.3e})")


if __name__ == "__main__":
    main()
