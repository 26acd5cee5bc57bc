"""Diagnostic (VERDICT r1 next #9): full-res 1024x2048 step composition —
augmentation (2-hot warp einsums) vs model step — to aim the next Pallas/
layout effort at the measured bottleneck, not vibes."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from torch_semantic_segmentation_tpu.data.transforms import (
    AugmentConfig, augment_batch)
from torch_semantic_segmentation_tpu.losses import resize_cross_entropy_loss
from torch_semantic_segmentation_tpu.models.fastscnn import fastscnn
from torch_semantic_segmentation_tpu.train import (
    OptimizerConfig, create_train_state, make_train_step)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
H, W = 1024, 2048
rng = np.random.default_rng(0)
ri = jnp.asarray(rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8))
rl = jnp.asarray(rng.integers(0, 19, (B, H, W), dtype=np.uint8))
key = jax.random.key(0)
cfg = AugmentConfig(crop=(H, W), out_dtype=jnp.bfloat16)


def timed(f, *args, n=5):
    out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


aug = jax.jit(lambda a, b, k: augment_batch(a, b, k, cfg))
t_aug = timed(aug, ri, rl, key)
print(f"augment fullres b{B}: {t_aug:.1f} ms -> {B/t_aug*1e3:.1f} img/s", flush=True)

model = fastscnn(19, dtype=jnp.bfloat16, upsample_logits=False,
                 rngs=nnx.Rngs(0))
tx = OptimizerConfig(max_steps=100).make()
gd, _, state = create_train_state(model, tx)
step = make_train_step(gd, tx, resize_cross_entropy_loss, remat=True)
img, lbl = aug(ri, rl, key)


def chain(s):
    s2, _ = step(s, img, lbl)
    return s2


s = chain(state)
_ = float(jnp.sum(jax.tree.leaves(s)[0].astype(jnp.float32)))
t0 = time.perf_counter()
for _ in range(5):
    s = chain(s)
_ = float(jnp.sum(jax.tree.leaves(s)[0].astype(jnp.float32)))
t_step = (time.perf_counter() - t0) / 5 * 1e3
print(f"train step (no aug) b{B}: {t_step:.1f} ms -> {B/t_step*1e3:.1f} img/s", flush=True)
print(f"sum: {t_aug+t_step:.1f} ms -> {B/(t_aug+t_step)*1e3:.1f} img/s  "
      f"(aug {100*t_aug/(t_aug+t_step):.0f}%)", flush=True)
