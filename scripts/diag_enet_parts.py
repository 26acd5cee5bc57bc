"""Ablation attribution of the ENet 768²-crop train step (zoo row).

trace_ops at enet b32/768² shows a flat kernel tail (no single >3% op)
with XLA auto-remat families active; the compiled step accesses 311.9 GB
*logical* (cost analysis, which probe-verifiedly excludes lane padding)
at ~670 GB/s achieved — i.e. near the HBM roofline on logical bytes
alone, while a hand count of the activation lifecycle is only ~50-60 GB.
This script bisects where those bytes/ms actually sit by timing on-chip
step variants that each delete one suspect:

    full        the zoo-bench step (aug → fwd → bwd → sgd, CE loss)
    meanloss    CE tail replaced by logits.mean() (isolates the loss)
    noaug       pre-augmented 768² bf16 inputs (isolates the aug warp)
    fwdonly     loss value only, no grad/update (isolates the backward)
    evalmode    deterministic fwd only (further removes dropout+BN stats)
    b16         full step at b16 (halves peak HBM: isolates auto-remat)

Usage (TPU host): python scripts/diag_enet_parts.py [model] [batch]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from flax import nnx

from torch_semantic_segmentation_tpu import profiling
from torch_semantic_segmentation_tpu.cli.common import build_loss
from torch_semantic_segmentation_tpu.data.transforms import (
    AugmentConfig, augment_batch)
from torch_semantic_segmentation_tpu.models import get_model
from torch_semantic_segmentation_tpu.train import (
    OptimizerConfig, create_train_state, make_train_step)

NAME = sys.argv[1] if len(sys.argv) > 1 else "enet"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
CROP = int(os.environ.get("ZOO_CROP", "768"))
H, W = 1024, 2048
STEPS = int(os.environ.get("STEPS", "6"))


def build(batch: int, loss: str = "ce", aug: bool = True, mode: str = "train"):
    model = get_model(NAME, 19, dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
    tx = OptimizerConfig(lr=0.045, max_steps=1000).make()
    gd_train, gd_eval, state = create_train_state(model, tx)
    aug_cfg = AugmentConfig(crop=(CROP, CROP), out_dtype=jnp.bfloat16)

    if mode in ("fwdonly", "evalmode"):
        gd = gd_train if mode == "fwdonly" else gd_eval
        loss_fn = build_loss("ce", ignore_index=255, aux_weight=0.4,
                             class_weights=None)

        def step(state, raw_i, raw_l, key):
            images, labels = augment_batch(raw_i, raw_l, key, aug_cfg)
            m = nnx.merge(gd, state.params, state.rest)
            out = m(images)
            if loss == "mean":
                head = out[0] if isinstance(out, (tuple, list)) else out
                return state, head.astype(jnp.float32).mean()
            return state, loss_fn(out, labels)

        jstep = jax.jit(step)
        ca = profiling.cost_analysis(
            lambda s, i, l, k: step(s, i, l, k)[1],
            state, jnp.zeros((batch, H, W, 3), jnp.uint8),
            jnp.zeros((batch, H, W), jnp.uint8), jax.random.PRNGKey(0))
        return jstep, state, ca

    if loss == "mean":
        def loss_fn(out, labels):
            head = out[0] if isinstance(out, (tuple, list)) else out
            return head.astype(jnp.float32).mean()
    else:
        loss_fn = build_loss("ce", ignore_index=255, aux_weight=0.4,
                             class_weights=None)
    inner = make_train_step(gd_train, tx, loss_fn, jit=False)

    def step(state, raw_i, raw_l, key):
        if aug:
            images, labels = augment_batch(raw_i, raw_l, key, aug_cfg)
        else:
            images, labels = raw_i, raw_l
        new_state, _ = inner(state, images, labels)
        return new_state

    jstep = jax.jit(step, donate_argnums=(0,))
    ishape = (batch, H, W, 3) if aug else (batch, CROP, CROP, 3)
    idt = jnp.uint8 if aug else jnp.bfloat16
    lshape = (batch, H, W) if aug else (batch, CROP, CROP)
    ca = profiling.cost_analysis(
        lambda s, i, l, k: step(s, i, l, k).step,
        state, jnp.zeros(ishape, idt), jnp.zeros(lshape, jnp.uint8),
        jax.random.PRNGKey(0))
    return jstep, state, ca


def run(tag: str, batch: int, **kw):
    jstep, state, ca = build(batch, **kw)
    aug = kw.get("aug", True)
    ishape = (batch, H, W, 3) if aug else (batch, CROP, CROP, 3)
    idt = jnp.uint8 if aug else jnp.bfloat16
    lshape = (batch, H, W) if aug else (batch, CROP, CROP)
    raw_i = jnp.zeros(ishape, idt)
    raw_l = jnp.zeros(lshape, jnp.uint8)
    key = jax.random.PRNGKey(0)

    mode = kw.get("mode", "train")
    if mode in ("fwdonly", "evalmode"):
        def chained(st, *a):
            st2, val = jstep(st, *a)
            return st2 if False else val  # fetch the loss value
        # fetch-sync on the loss value itself
        for _ in range(2):
            _, v = jstep(state, raw_i, raw_l, key)
        profiling.sync(v)
        with profiling.Walltime(STEPS) as w:
            for _ in range(STEPS):
                _, v = jstep(state, raw_i, raw_l, key)
            profiling.sync(v)
        sec = w.seconds_per_step
    else:
        sec, _ = profiling.measure(
            lambda st, *a: jstep(st, *a), state, raw_i, raw_l, key,
            steps=STEPS, warmup=2)
    gbs = ca["bytes_accessed"] / 1e9
    print(f"{tag:10s} b{batch:<3d} {sec*1e3:8.1f} ms/step "
          f"{batch/sec:7.1f} img/s  {gbs:6.1f} GB  "
          f"{gbs/sec:6.0f} GB/s  {ca['flops']/1e12:5.2f} TF")
    return sec


if __name__ == "__main__":
    print(f"# {NAME} crop={CROP} steps={STEPS}")
    run("full", B)
    run("meanloss", B, loss="mean")
    run("noaug", B, aug=False)
    run("fwdonly", B, mode="fwdonly")
    run("evalmode", B, mode="evalmode")
    run("full", 16)
