"""Dropout mask RNG cost at bench scale: threefry (jax default) vs the
TPU hardware RNG ('rbg' impl, lowers to the rng-bit-generator HLO), and
full-width uniform vs uint8-threshold masks (4x fewer random bits).
Usage: python scripts/diag_rng.py [batch]
"""
import sys; sys.path.insert(0, "/root/repo")
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 48
SHAPE = (B, 128, 256, 128)   # FastSCNN classifier activation at full-res


def report(name, f, *args, n=8):
    c = jax.jit(f).lower(*args).compile()
    out = c(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = c(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:7.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=SHAPE), jnp.bfloat16)
    key_tf = jax.random.key(1)
    key_rbg = jax.random.key(1, impl="rbg")

    def drop_bernoulli(x, key):
        keep = jax.random.bernoulli(key, 0.9, x.shape)
        return jnp.where(keep, x / jnp.bfloat16(0.9), jnp.bfloat16(0))

    def drop_u8(x, key):
        # keep iff u8 < round(0.9*256): rate quantized to 1/256 steps
        bits = jax.random.bits(key, x.shape, jnp.uint8)
        return jnp.where(bits < 230, x / jnp.bfloat16(0.9), jnp.bfloat16(0))

    report("bernoulli threefry ", drop_bernoulli, x, key_tf)
    report("bernoulli rbg      ", drop_bernoulli, x, key_rbg)
    report("u8-thresh threefry ", drop_u8, x, key_tf)
    report("u8-thresh rbg      ", drop_u8, x, key_rbg)

    # the split cost matters too: nnx.Dropout fold_ins per call
    def split_drop(x, key):
        key = jax.random.fold_in(key, 7)
        return drop_bernoulli(x, key)

    report("fold_in+bern  tf   ", split_drop, x, key_tf)
    report("fold_in+bern  rbg  ", split_drop, x, key_rbg)


if __name__ == "__main__":
    main()
