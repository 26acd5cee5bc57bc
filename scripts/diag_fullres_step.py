"""Diagnostic: full-res train-step roofline — FLOPs/bytes from XLA
cost_analysis vs measured walltime, remat on/off."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from torch_semantic_segmentation_tpu.losses import resize_cross_entropy_loss
from torch_semantic_segmentation_tpu.models.fastscnn import fastscnn
from torch_semantic_segmentation_tpu.train import (
    OptimizerConfig, create_train_state, make_train_step)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
H, W = 1024, 2048
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.bfloat16)
lbl = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)

model = fastscnn(19, dtype=jnp.bfloat16, upsample_logits=False,
                 rngs=nnx.Rngs(0))
tx = OptimizerConfig(max_steps=100).make()
gd, _, state0 = create_train_state(model, tx)

for remat in (True, False):
    t0 = time.perf_counter()
    try:
        step = make_train_step(gd, tx, resize_cross_entropy_loss,
                               remat=remat, donate=False, jit=False)
        c = jax.jit(step).lower(state0, img, lbl).compile()
        ca = c.cost_analysis()
        fl = ca.get("flops", 0.0); by = ca.get("bytes accessed", 0.0)
        print(f"remat={remat}: compiled in {time.perf_counter()-t0:.0f}s",
              flush=True)
        s, _ = c(state0, img, lbl)
        _ = float(jax.tree.leaves(s)[0].astype(jnp.float32).sum())
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            s, _ = c(s, img, lbl)
        _ = float(jax.tree.leaves(s)[0].astype(jnp.float32).sum())
        dt = (time.perf_counter() - t0) / n
        print(f"remat={remat}: {dt*1e3:.1f} ms  {B/dt:.1f} img/s  "
              f"{fl/dt/1e12:.1f} TFLOP/s  {by/dt/1e9:.0f} GB/s  "
              f"(flops {fl/1e12:.2f} T, bytes {by/1e9:.1f} GB per step)",
              flush=True)
    except Exception as e:
        print(f"remat={remat}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
