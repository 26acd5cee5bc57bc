"""Metrics (T4): on-device confusion-matrix mIoU (SURVEY.md §2.2, §3.3).

The (C, C) confusion matrix is accumulated on-device inside the jitted eval
step via a scatter-add; across data-parallel replicas the sharded per-step
partial matrices reduce with a `psum` XLA inserts under GSPMD (the matrix is
a plain output the jit replicates). Only the final C×C fp64-safe counts ever
leave the device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def new_confusion_matrix(num_classes: int) -> jax.Array:
    return jnp.zeros((num_classes, num_classes), dtype=jnp.float32)


def update_confusion_matrix(
    cm: jax.Array,
    preds: jax.Array,
    labels: jax.Array,
    *,
    ignore_index: int = 255,
) -> jax.Array:
    """cm[t, p] += count(label==t & pred==p) over valid pixels. On-device."""
    c = cm.shape[0]
    valid = labels != ignore_index
    t = jnp.where(valid, labels, 0).astype(jnp.int32).reshape(-1)
    p = preds.astype(jnp.int32).reshape(-1)
    idx = t * c + p
    w = valid.astype(jnp.float32).reshape(-1)
    flat = cm.reshape(-1).at[idx].add(w)
    return flat.reshape(c, c)


def iou_from_confusion_matrix(cm: jax.Array | np.ndarray) -> tuple[np.ndarray, float]:
    """Per-class IoU and mean IoU (nan-mean over classes with support),
    matching the ignite ConfusionMatrix→mIoU convention (SURVEY.md §3.3)."""
    cm = np.asarray(cm, dtype=np.float64)
    tp = np.diag(cm)
    denom = cm.sum(0) + cm.sum(1) - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(denom > 0, tp / denom, np.nan)
    miou = float(np.nanmean(iou)) if np.any(~np.isnan(iou)) else 0.0
    return iou, miou


def pixel_accuracy_from_confusion_matrix(cm: jax.Array | np.ndarray) -> float:
    cm = np.asarray(cm, dtype=np.float64)
    total = cm.sum()
    return float(np.diag(cm).sum() / total) if total > 0 else 0.0


__all__ = [
    "new_confusion_matrix",
    "update_confusion_matrix",
    "iou_from_confusion_matrix",
    "pixel_accuracy_from_confusion_matrix",
]
