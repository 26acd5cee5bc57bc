"""Compiled-bytes attribution of the full-res train step (cost analysis
only — no timing, safe to run on a contended host): whole step, then
aug-only, LDS-only (packed vs NHWC), GFE, FFM+cls, loss tail.
Usage: python scripts/diag_step_bytes.py [batch]
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from flax import nnx

B = int(sys.argv[1]) if len(sys.argv) > 1 else 40
H, W = 1024, 2048


def gb(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis() or {}
    return float(ca.get("bytes accessed", 0.0)) / 1e9


def main():
    from torch_semantic_segmentation_tpu.data.transforms import (
        AugmentConfig, augment_batch)
    from torch_semantic_segmentation_tpu.losses import (
        resize_cross_entropy_loss)
    from torch_semantic_segmentation_tpu.models.fastscnn import fastscnn

    rng = np.random.default_rng(0)
    raw_img = jnp.asarray(rng.integers(0, 256, (B, H, W, 3), np.uint8))
    raw_lbl = jnp.asarray(rng.integers(0, 19, (B, H, W), np.uint8))
    key = jax.random.key(0)
    cfg = AugmentConfig(crop=(H, W), out_dtype=jnp.bfloat16)

    print(f"b{B} {H}x{W} bf16 — compiled bytes (GB):", flush=True)
    print(f"aug fwd            : {gb(lambda i, l, k: augment_batch(i, l, k, cfg), raw_img, raw_lbl, key):7.2f}",
          flush=True)

    m = fastscnn(19, dtype=jnp.bfloat16, upsample_logits=False,
                 rngs=nnx.Rngs(0))
    m.eval()   # BN running stats: no stat mutation inside grad traces
    gd, params, rest = nnx.split(m, nnx.Param, ...)
    x = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.bfloat16)
    lbl = jnp.asarray(raw_lbl, jnp.int32)

    def stagewise(name, f, *args):
        print(f"{name}: {gb(f, *args):7.2f}", flush=True)

    def fb(loss_fn):
        def outer(p, *args):
            return loss_fn(p, *args)
        def wrapped(p, *args):
            l, g = jax.value_and_grad(outer)(p, *args)
            return l, g
        return wrapped

    # LDS packed vs NHWC, f+b
    def lds_loss_pk(p, x):
        mm = nnx.merge(gd, p, rest)
        from torch_semantic_segmentation_tpu.ops import packed_lds
        return jnp.sum(packed_lds.lds_forward(mm.lds, x).astype(jnp.float32) ** 2)

    def lds_loss_ref(p, x):
        mm = nnx.merge(gd, p, rest)
        y = mm.lds.ds2(mm.lds.ds1(mm.lds.conv(x)))
        return jnp.sum(y.astype(jnp.float32) ** 2)

    stagewise("LDS f+b packed     ", fb(lds_loss_pk), params, x)
    stagewise("LDS f+b NHWC       ", fb(lds_loss_ref), params, x)

    hi = jnp.zeros((B, H // 8, W // 8, 64), jnp.bfloat16)

    def gfe_loss(p, h):
        mm = nnx.merge(gd, p, rest)
        return jnp.sum(mm.gfe(h).astype(jnp.float32) ** 2)

    stagewise("GFE f+b            ", fb(gfe_loss), params, hi)

    lo = jnp.zeros((B, H // 32, W // 32, 128), jnp.bfloat16)

    def head_loss(p, h, l):
        mm = nnx.merge(gd, p, rest)
        return jnp.sum(mm.classifier(mm.ffm(h, l)).astype(jnp.float32) ** 2)

    stagewise("FFM+cls f+b        ", fb(head_loss), params, hi, lo)

    logits = jnp.zeros((B, H // 8, W // 8, 19), jnp.bfloat16)

    def loss_tail(lg, lb):
        return resize_cross_entropy_loss(lg, lb)

    def loss_tail_fb(lg, lb):
        l, g = jax.value_and_grad(loss_tail)(lg, lb)
        return l, g

    stagewise("loss tail f+b      ", loss_tail_fb, logits, lbl)


if __name__ == "__main__":
    main()
