"""Zoo-wide TRAINING throughput table (companion to bench_infer.py).

bench.py measures the judged FastSCNN configs; this script demonstrates
the whole model zoo trains fast through the same one-program path
(fused on-device aug -> fwd -> bwd -> SGD, donated buffers): one row per
model, reference-style 768² crops augmented from resident full-res
1024×2048 uint8 (SURVEY.md §2.5: the reference trained on 768² crops).

Usage (TPU host):
    python scripts/bench_train_zoo.py                  # all models
    python scripts/bench_train_zoo.py enet unet        # subset
    ZOO_BATCH=32 ZOO_STEPS=12 python scripts/bench_train_zoo.py

Aux-head models (bisenet/icnet) train through their aux losses
(aux_weight 0.4) — the training config of BASELINE config 5, not a
stripped-down forward. Per-model batch falls back b32→b16→b8 on OOM;
the batch used is printed per row. Timing is fetch-synced best-of-2
windows with the same degraded-episode retry rule as bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from flax import nnx

HEIGHT = int(os.environ.get("ZOO_H", "1024"))
WIDTH = int(os.environ.get("ZOO_W", "2048"))
CROP = int(os.environ.get("ZOO_CROP", "768"))
BATCH = int(os.environ.get("ZOO_BATCH", "32"))
STEPS = int(os.environ.get("ZOO_STEPS", "10"))
REMAT = bool(int(os.environ.get("ZOO_REMAT", "0")))

# Measured per-model batch overrides (2026-08-19 sweep): the big-
# activation models tip XLA into internal rematerialization at larger
# batches (trace_ops shows *.remat recompute families), so a smaller
# batch is FASTER per image: unet 32.9@b8 vs 25.7@b16 (b4 is dispatch-
# bound at 12.4; jax.checkpoint remat at b8 is 26.6 — worse), erfnet
# 64.6@b8 vs 41.7@b16, esnet 46.7@b8 vs 35.6@b16, lednet 52.8@b8 vs
# 46.3@b16, deeplabv3_resnet50 113.5@b16 vs 93.1@b32. Probed and kept
# at the default ladder: enet 70.0@b32 > 61.3@b16, bisenet 208.5@b32 >
# 195.3@b16, deeplabv3_resnet101 91.8@b16 > 75.4@b8.
# 2026-08-20 round 5 (structured kernel build + packed bodies ON for
# enet/esnet/erfnet/lednet, resize heads OFF everywhere — A/Bs in
# docs/FULLRES_ROOFLINE.md round-5): b8 re-confirmed as the sweet spot
# for the packed bodies (esnet 136.4@b8 > 129.0@b16, erfnet 144.1@b8 >
# 131.1@b16, lednet 157.4@b8 > 148.2@b16 > 128.7@b32, unet 35.3@b8 >
# 24.8@b12 > 22.0@b10). Full table at HEAD in README ("model zoo").
PREFERRED_BATCH = {"unet": 8, "erfnet": 8, "esnet": 8, "lednet": 8,
                   "deeplabv3_resnet50": 16}


def build_zoo_step(name: str, crop: int):
    from torch_semantic_segmentation_tpu.cli.common import build_loss
    from torch_semantic_segmentation_tpu.data.transforms import (
        AugmentConfig, augment_batch)
    from torch_semantic_segmentation_tpu.models import get_model
    from torch_semantic_segmentation_tpu.train import (
        OptimizerConfig, create_train_state, make_train_step)

    model = get_model(name, 19, dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
    tx = OptimizerConfig(lr=0.045, max_steps=1000).make()
    gd_train, _, state = create_train_state(model, tx)
    # ZOO_LOSS=ohem measures the OHEM training tail (the round-5 A/B
    # context for the packed resize heads: OHEM's per-pixel map breaks
    # the plain-CE resize→loss fusion that voided their premise)
    loss_fn = build_loss(os.environ.get("ZOO_LOSS", "ce"),
                         ignore_index=255, aux_weight=0.4,
                         class_weights=None)
    inner = make_train_step(gd_train, tx, loss_fn, jit=False, remat=REMAT)
    aug_cfg = AugmentConfig(crop=(crop, crop), out_dtype=jnp.bfloat16)

    def step(state, raw_images, raw_labels, key):
        images, labels = augment_batch(raw_images, raw_labels, key, aug_cfg)
        return inner(state, images, labels)

    return jax.jit(step, donate_argnums=(0,)), state


def time_model(name: str, batch: int) -> tuple[float, int]:
    # An explicit ZOO_BATCH beats the measured per-model table (so sweeps
    # work); the OOM ladder only ever DESCENDS from the starting batch.
    start = (batch if "ZOO_BATCH" in os.environ
             else PREFERRED_BATCH.get(name, batch))
    ladder = [b for b in dict.fromkeys((start, 16, 8)) if b <= start]
    for b in ladder:
        try:
            jstep, state = build_zoo_step(name, CROP)
            rng = np.random.default_rng(0)
            ri = jnp.asarray(rng.integers(
                0, 256, (b, HEIGHT, WIDTH, 3), dtype=np.uint8))
            rl = jnp.asarray(rng.integers(
                0, 19, (b, HEIGHT, WIDTH), dtype=np.uint8))
            key = jax.random.key(0)
            state, metrics = jstep(state, ri, rl, key)
            float(metrics["loss"])                      # compile + sync
            dt = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(STEPS):
                    key, sub = jax.random.split(key)
                    state, metrics = jstep(state, ri, rl, sub)
                float(metrics["loss"])
                dt = min(dt, (time.perf_counter() - t0) / STEPS)
            return b / dt, b
        except Exception as e:
            print(f"  {name} b{b}: {type(e).__name__}: {str(e)[:100]}",
                  file=sys.stderr)
    return float("nan"), 0


def main() -> None:
    from torch_semantic_segmentation_tpu.models import available_models
    names = sys.argv[1:] or available_models()
    print(f"# train 768² crops from {HEIGHT}x{WIDTH}, bf16, plain CE "
          f"(aux-weighted where the model has aux heads), "
          f"{STEPS}-step best-of-2 windows")
    print(f"{'model':>20}  {'img/s':>8}  batch")
    for name in names:
        rate, b = time_model(name, BATCH)
        print(f"{name:>20}  {rate:8.1f}  b{b}")


if __name__ == "__main__":
    main()
