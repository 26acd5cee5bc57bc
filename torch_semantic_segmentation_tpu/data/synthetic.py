"""Synthetic Cityscapes-shaped data for tests/CI and benchmarking.

The CPU-runnable contract config (BASELINE.json config 1) runs on synthetic
data in CI (SURVEY.md §4.3): structured random images with blob-wise label
masks that include ignore_index regions, so losses/metrics exercise their
edge cases.
"""

from __future__ import annotations

import numpy as np


def synthetic_batch(
    batch: int,
    height: int,
    width: int,
    num_classes: int = 19,
    *,
    ignore_index: int = 255,
    ignore_frac: float = 0.05,
    seed: int = 0,
    dtype=np.float32,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (images NHWC float normalised-ish, labels NHW int32)."""
    rng = np.random.default_rng(seed)
    images = rng.normal(0.0, 1.0, (batch, height, width, 3)).astype(dtype)
    # blobby labels: low-res random classes upsampled (nearest)
    gh, gw = max(height // 32, 1), max(width // 32, 1)
    grid = rng.integers(0, num_classes, (batch, gh, gw)).astype(np.int32)
    labels = np.repeat(np.repeat(grid, height // gh + 1, 1), width // gw + 1, 2)
    labels = labels[:, :height, :width]
    if ignore_frac > 0:
        mask = rng.random((batch, height, width)) < ignore_frac
        labels = np.where(mask, ignore_index, labels).astype(np.int32)
    return images, labels


def synthetic_uint8_batch(batch: int, height: int, width: int,
                          num_classes: int = 19, *, seed: int = 0
                          ) -> tuple[np.ndarray, np.ndarray]:
    """uint8 images + labels — the raw form the augmentation pipeline eats."""
    images, labels = synthetic_batch(batch, height, width, num_classes,
                                     ignore_frac=0.0, seed=seed)
    images = ((images - images.min()) / (np.ptp(images) + 1e-6) * 255).astype(np.uint8)
    return images, labels.astype(np.uint8 if num_classes < 255 else np.int32)
