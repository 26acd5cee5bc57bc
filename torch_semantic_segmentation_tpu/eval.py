"""Evaluation: single-scale and multi-scale(+flip) mIoU evaluators
(SURVEY.md §2.6 "Evaluator", §3.3; BASELINE.json config 5 pairs multi-scale
eval with BiSeNet/ICNet).

Multi-scale eval resizes the input to a *fixed static set* of scales,
forwards each, resizes the softmax back to the label grid, and averages —
all inside ONE jit program per batch shape, so there is no per-scale
recompilation and no host round-trip (SURVEY.md §7 "Full-res memory").
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx

from torch_semantic_segmentation_tpu.metrics import update_confusion_matrix
from torch_semantic_segmentation_tpu.ops import resize_bilinear
from torch_semantic_segmentation_tpu.ops.upsample import resize_bilinear_nhcw


def _main_logits(outputs):
    from torch_semantic_segmentation_tpu.ops import packed_ops

    out = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
    return packed_ops.as_nhwc(out)


def make_multiscale_eval_step(
    graphdef_eval: nnx.GraphDef,
    *,
    num_classes: int,
    scales: tp.Sequence[float] = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75),
    flip: bool = True,
    ignore_index: int = 255,
    align_corners: bool = False,
    size_divisor: int = 32,
    jit: bool = True,
):
    """Compiled multi-scale eval step: (params, rest, cm, images, labels)->cm.

    Scaled sizes are rounded to `size_divisor` so every model's stride
    pyramid divides evenly.
    """

    def round_div(v: float) -> int:
        return max(int(round(v / size_divisor)) * size_divisor, size_divisor)

    def step(params, rest, cm, images, labels):
        model = nnx.merge(graphdef_eval, params, rest)
        n, h, w, _ = images.shape
        # probabilities accumulate in the lane-major N,H,C,W layout
        # (ops.resize_bilinear_nhcw): with C=19 minor the full-res softmax,
        # adds and final argmax would waste 109/128 lanes per vector op
        prob = jnp.zeros((n, h, num_classes, w), jnp.float32)
        for s in scales:
            sh, sw = round_div(h * s), round_div(w * s)
            xs = resize_bilinear(images, (sh, sw), align_corners=align_corners)
            logits = _main_logits(model(xs))
            x = resize_bilinear_nhcw(logits, (h, w),
                                     align_corners=align_corners)
            prob = prob + jax.nn.softmax(x, axis=2)
            if flip:
                logits_f = _main_logits(model(xs[:, :, ::-1, :]))[:, :, ::-1, :]
                x = resize_bilinear_nhcw(logits_f, (h, w),
                                         align_corners=align_corners)
                prob = prob + jax.nn.softmax(x, axis=2)
        preds = jnp.argmax(prob, axis=2)
        return update_confusion_matrix(cm, preds, labels,
                                       ignore_index=ignore_index)

    if jit:
        return jax.jit(step, donate_argnums=(2,))
    return step


def evaluate(
    eval_step,
    params,
    rest,
    batches: tp.Iterable[tuple[jax.Array, jax.Array]],
    *,
    num_classes: int,
):
    """Run an evaluator over batches; returns (per-class IoU, mIoU, cm).
    Only the final (C, C) matrix leaves the device."""
    from torch_semantic_segmentation_tpu.metrics import (
        iou_from_confusion_matrix, new_confusion_matrix)

    cm = new_confusion_matrix(num_classes)
    for images, labels in batches:
        cm = eval_step(params, rest, cm, images, labels)
    iou, miou = iou_from_confusion_matrix(cm)
    return iou, miou, cm
