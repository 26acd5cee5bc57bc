"""Inference/serving path (the "production deployment and serving" tier).

`make_predict_fn(model)` returns a jit-compiled predictor producing either
class-id maps or probability maps from uint8 NHWC frames:
- eval-mode graph captured once (BN running stats, no dropout);
- BatchNorm folded into conv kernels (`ops.fold.fold_batchnorm`) — one MXU
  op per conv-bn-act block;
- on-device normalisation fused into the same program (uint8 in, ids out:
  only 1 byte/px crosses the host boundary each way);
- bf16 compute by construction when the model was built with
  `dtype=jnp.bfloat16`.

`aot_compile(...)` lowers+compiles ahead of time for a fixed input shape so
the first serving request pays no compile latency.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx

from torch_semantic_segmentation_tpu.data.transforms import (
    CITYSCAPES_MEAN, CITYSCAPES_STD)


def make_predict_fn(
    model: nnx.Module,
    *,
    fold_bn: bool = True,
    mean: tp.Sequence[float] = CITYSCAPES_MEAN,
    std: tp.Sequence[float] = CITYSCAPES_STD,
    output: str = "ids",          # "ids" | "probs" | "logits"
) -> tp.Callable[[jax.Array], jax.Array]:
    """Build the deployable predictor: uint8 NHWC frames -> predictions."""
    model.eval()
    if fold_bn:
        from torch_semantic_segmentation_tpu.ops.fold import fold_batchnorm
        fold_batchnorm(model)
    graphdef, state = nnx.split(model)
    mean_a = jnp.asarray(mean, jnp.float32) * 255.0
    std_a = jnp.asarray(std, jnp.float32) * 255.0
    # low-res-logit models upsample in the predictor; honour the model's
    # own resize convention so ids match its upsample_logits=True twin
    align_corners = bool(getattr(model, "align_corners", False))

    @jax.jit
    def predict(frames: jax.Array) -> jax.Array:
        from torch_semantic_segmentation_tpu.ops import (
            resize_argmax, resize_bilinear)

        x = (frames.astype(jnp.float32) - mean_a) / std_a
        m = nnx.merge(graphdef, state)
        logits = m(x)
        if isinstance(logits, (tuple, list)):
            logits = logits[0]
        from torch_semantic_segmentation_tpu.ops import packed_ops

        logits = packed_ops.as_nhwc(logits)
        size = (frames.shape[1], frames.shape[2])
        low_res = (logits.shape[1], logits.shape[2]) != size
        if output == "ids":
            # models built with upsample_logits=False emit 1/4–1/8-res
            # logits; the ×k upsample runs fused with the argmax in a
            # lane-major layout (ops.resize_argmax) — full-res NHWC logits
            # never materialise
            if low_res:
                return resize_argmax(logits, size, align_corners=align_corners)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        if low_res:
            logits = resize_bilinear(logits, size, align_corners=align_corners)
        if output == "probs":
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return logits

    return predict


def aot_compile(predict_fn, batch: int, height: int, width: int):
    """Ahead-of-time compile for a fixed frame shape; returns the compiled
    executable (call it like the original function)."""
    spec = jax.ShapeDtypeStruct((batch, height, width, 3), jnp.uint8)
    return jax.jit(predict_fn).lower(spec).compile()
