"""Class-weight computation (SURVEY.md §2.5 "Class-weight computation").

The reference's ENet-style weighting w_c = 1 / ln(c + p_c) from label-pixel
frequencies. Cityscapes/CamVid ship precomputed tables
(`data.cityscapes.enet_class_weights` / `data.camvid.enet_class_weights`);
this module computes them for any dataset (e.g. BDD/Mapillary or custom
label spaces) with a one-pass host scan.
"""

from __future__ import annotations

import numpy as np


def pixel_frequencies(dataset, num_classes: int, *,
                      label_lut: np.ndarray | None = None,
                      ignore_index: int = 255,
                      max_samples: int | None = None,
                      seed: int = 0) -> np.ndarray:
    """Per-class pixel frequency over (a sample of) the dataset.

    `dataset[i]` must return (image, label). `max_samples` subsamples for
    large sets (Mapillary: ~18k images); frequencies converge quickly.
    """
    n = len(dataset)
    idxs = np.arange(n)
    if max_samples is not None and max_samples < n:
        idxs = np.random.default_rng(seed).choice(n, max_samples,
                                                  replace=False)
    counts = np.zeros(num_classes, dtype=np.int64)
    total = 0
    for i in idxs:
        _, lbl = dataset[int(i)]
        if label_lut is not None:
            lbl = label_lut[lbl]
        valid = lbl != ignore_index
        counts += np.bincount(lbl[valid].ravel().astype(np.int64),
                              minlength=num_classes)[:num_classes]
        total += int(valid.sum())
    return counts / max(total, 1)


def enet_class_weights(freq: np.ndarray, c: float = 1.02) -> np.ndarray:
    """w = 1 / ln(c + p) (Paszke 2016 §5.2)."""
    return (1.0 / np.log(c + np.asarray(freq))).astype(np.float32)


def compute_class_weights(dataset, num_classes: int, **kwargs) -> np.ndarray:
    """One-call helper: scan → frequencies → ENet weights."""
    return enet_class_weights(pixel_frequencies(dataset, num_classes,
                                                **kwargs))
