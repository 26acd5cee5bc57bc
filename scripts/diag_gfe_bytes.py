"""Per-block compiled-bytes attribution of the GFE region at full res
(cost analysis only — no timing). TRAIN-mode blocks (batch-stat BN, so
the folded-BN and MBConv-kernel routes actually fire on TPU), each
measured fwd+param-grads with the MBConv kernel routed vs suppressed.
Usage: python scripts/diag_gfe_bytes.py [batch]
"""

import contextlib
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 48
H, W = 1024, 2048


def gb(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis() or {}
    return float(ca.get("bytes accessed", 0.0)) / 1e9


def main():
    from torch_semantic_segmentation_tpu.models.fastscnn import fastscnn
    from torch_semantic_segmentation_tpu.ops import pallas_mbconv

    m = fastscnn(19, dtype=jnp.bfloat16, upsample_logits=False,
                 rngs=nnx.Rngs(0))
    gd, params, rest = nnx.split(m, nnx.Param, ...)
    rng = np.random.default_rng(0)

    def block_fb(si, bi):
        def f(p, r, x):
            mm = nnx.merge(gd, p, r)
            mm.train()
            blk = (mm.gfe.stage1, mm.gfe.stage2, mm.gfe.stage3)[si][bi]

            def compute(mm_blk):
                return jnp.sum(mm_blk(x).astype(jnp.float32))

            _, g = nnx.value_and_grad(compute)(blk)
            return g
        return f

    def ppm_fb(p, r, x):
        mm = nnx.merge(gd, p, r)
        mm.train()

        def compute(ppm):
            return jnp.sum(ppm(x).astype(jnp.float32))

        _, g = nnx.value_and_grad(compute)(mm.gfe.ppm)
        return g

    # stage input shapes down the chain (train-mode forward, routed off
    # — shapes are identical either way)
    shapes = []
    x = jnp.asarray(rng.normal(size=(B, H // 8, W // 8, 64)), jnp.bfloat16)
    with pallas_mbconv.suppress_routing():
        mm = nnx.merge(gd, params, rest)
        mm.eval()  # shape pass only; train-mode BN mutates under eval_shape
        for si, stage in enumerate((mm.gfe.stage1, mm.gfe.stage2,
                                    mm.gfe.stage3)):
            for bi, blk in enumerate(stage):
                shapes.append((si, bi, tuple(x.shape)))
                x = jax.eval_shape(blk, x)
                x = jnp.asarray(rng.normal(size=x.shape), x.dtype)
        ppm_in = x

    for routed in (True, False):
        ctx = (contextlib.nullcontext() if routed
               else pallas_mbconv.suppress_routing())
        with ctx:
            print(f"--- mbconv routed={routed} (train mode) ---", flush=True)
            for si, bi, shp in shapes:
                xin = jnp.asarray(rng.normal(size=shp), jnp.bfloat16)
                g = gb(block_fb(si, bi), params, rest, xin)
                print(f"stage{si+1} block{bi} in{shp}: {g:6.2f} GB",
                      flush=True)
            print(f"PPM in{tuple(ppm_in.shape)}: "
                  f"{gb(ppm_fb, params, rest, ppm_in):6.2f} GB", flush=True)


if __name__ == "__main__":
    main()
