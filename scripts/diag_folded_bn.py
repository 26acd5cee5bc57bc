"""Train-mode byte attribution for the folded-1x1-BN routing
(ops/folded_bn.py): GFE and classifier fwd+bwd compiled bytes with the
fold on vs off, plus a single expand-conv microcosm.
Usage: python scripts/diag_folded_bn.py [batch]
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


def train_fb(make_module, x):
    """fwd+bwd bytes of a training-mode nnx module (BN stats mutating)."""
    def run(x):
        m = make_module()
        m.train()
        def compute(m):
            return jnp.sum(m(x).astype(jnp.float32) ** 2)
        loss, grads = nnx.value_and_grad(compute)(m)
        return loss, grads
    return gb(run, x)


def main():
    from torch_semantic_segmentation_tpu.models.fastscnn import (
        Classifier, GlobalFeatureExtractor)
    from torch_semantic_segmentation_tpu.ops import InvertedResidual

    hi = jnp.zeros((B, H // 8, W // 8, 64), jnp.bfloat16)
    fused = jnp.zeros((B, H // 8, W // 8, 128), jnp.bfloat16)
    kw = dict(dtype=jnp.bfloat16, param_dtype=jnp.float32)

    for fold in ("0", "1"):
        os.environ["TPU_SEG_FOLDED_BN"] = fold
        tag = "fold=" + fold
        print(f"[{tag}] IR block1 (64->384->64 s2 @1/8) f+b: "
              f"{train_fb(lambda: InvertedResidual(64, 64, stride=2, rngs=nnx.Rngs(0), **kw), hi):7.2f}",
              flush=True)
        print(f"[{tag}] GFE train f+b                       : "
              f"{train_fb(lambda: GlobalFeatureExtractor(64, (64, 96, 128), 128, rngs=nnx.Rngs(0), **kw), hi):7.2f}",
              flush=True)
        print(f"[{tag}] classifier train f+b                : "
              f"{train_fb(lambda: Classifier(128, 19, rngs=nnx.Rngs(0), **kw), fused):7.2f}",
              flush=True)


if __name__ == "__main__":
    main()
