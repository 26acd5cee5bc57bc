"""Attribute the classifier/FFM stage time at full-res bench scale:
dropout RNG cost, each separable conv, the FFM upsample — fwd and
fwd+bwd, fetch-synced. Usage: python scripts/diag_cls_parts.py [batch]
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
from flax import nnx

B = int(sys.argv[1]) if len(sys.argv) > 1 else 48
H8, W8 = 128, 256


def _fetch(out):
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))


def report(name, f, *args, n=6):
    c = jax.jit(f).lower(*args).compile()
    by = (c.cost_analysis() or {}).get("bytes accessed", 0.0)
    out = c(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = c(*args)
    _fetch(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:7.2f} ms  {by/1e9:6.2f} GB  "
          f"{by/dt/1e9:4.0f} GB/s", flush=True)


def main():
    from torch_semantic_segmentation_tpu.models.fastscnn import fastscnn

    m = fastscnn(19, dtype=jnp.bfloat16, upsample_logits=False,
                 rngs=nnx.Rngs(0))
    gd, params, rest = nnx.split(m, nnx.Param, ...)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H8, W8, 128)), jnp.bfloat16)
    key = jax.random.key(1)

    # dropout mask generation alone (threefry default)
    def drop(x, key):
        keep = jax.random.bernoulli(key, 0.9, x.shape)
        return jnp.where(keep, x / 0.9, 0.0)

    report("dropout(threefry)   ", drop, x, key)

    def rbits(x, key):
        return jax.random.bits(key, (x.shape[0], H8, W8, 128), jnp.uint8)

    report("random.bits u8      ", rbits, x, key)

    def parts(label, fn):
        def fwd(p, r, x):
            mm = nnx.merge(gd, p, r); mm.train()
            return fn(mm, x)
        report(f"{label} fwd      ", fwd, params, rest, x)

        def fb(p, r, x):
            mm = nnx.merge(gd, p, r); mm.train()

            def compute(mm):
                return jnp.sum(fn(mm, x).astype(jnp.float32))

            _, g = nnx.value_and_grad(compute)(mm)
            return g
        report(f"{label} f+b      ", fb, params, rest, x)

    parts("cls.ds1   ", lambda mm, x: mm.classifier.ds1(x))
    parts("cls.ds1+2 ", lambda mm, x: mm.classifier.ds2(mm.classifier.ds1(x)))
    parts("cls full  ", lambda mm, x: mm.classifier(x))

    lo = jnp.asarray(rng.normal(size=(B, 32, 64, 128)), jnp.bfloat16)

    def ffm(mm, hi_lo):
        return mm.ffm(hi_lo[0], hi_lo[1])

    hi = jnp.asarray(rng.normal(size=(B, H8, W8, 64)), jnp.bfloat16)
    parts("ffm       ", lambda mm, _x: mm.ffm(hi, lo))


if __name__ == "__main__":
    main()
