"""Diagnostic: full-res step byte/time decomposition — resize-CE loss tail
(1/8-res logits -> 1024x2048 labels) vs model fwd+bwd with a trivial tail.
Aims the next byte-reduction effort (VERDICT r1 #9)."""
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
lbl = jnp.asarray(rng.integers(0, 19, (B, H, W)), jnp.int32)
logits_small = jnp.asarray(rng.normal(size=(B, H // 8, W // 8, 19)),
                           jnp.bfloat16)


def _fetch(out):
    # axon's block_until_ready does not sync; force a device->host fetch
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


def report(name, f, *args):
    c = jax.jit(f).lower(*args).compile()
    ca = c.cost_analysis()
    by = ca.get("bytes accessed", 0.0)
    dt = bench_compiled(c, *args)
    print(f"{name}: {dt*1e3:7.1f} ms  {by/1e9:6.1f} GB  {by/dt/1e9:4.0f} GB/s",
          flush=True)
    return dt, by


# 1. loss fwd+bwd alone (grad wrt logits)
def loss_fb(lg, lb):
    return jax.grad(lambda l: resize_cross_entropy_loss(l, lb))(lg)

report("loss fwd+bwd       ", loss_fb, logits_small, lbl)

# 2. loss fwd only
report("loss fwd           ",
       lambda lg, lb: resize_cross_entropy_loss(lg, lb), logits_small, lbl)

# 3. full train step with real loss vs trivial loss
model = fastscnn(19, dtype=jnp.bfloat16, upsample_logits=False,
                 rngs=nnx.Rngs(0))
tx = OptimizerConfig(max_steps=100).make()
gd, _, state0 = create_train_state(model, tx)
img = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.bfloat16)


def trivial_loss(lg, lb, **kw):
    return jnp.mean(lg.astype(jnp.float32) ** 2)


for name, lf in (("step real loss     ", resize_cross_entropy_loss),
                 ("step trivial loss  ", trivial_loss)):
    step = make_train_step(gd, tx, lf, remat=False, donate=False, jit=False)
    report(name, step, state0, img, lbl)
