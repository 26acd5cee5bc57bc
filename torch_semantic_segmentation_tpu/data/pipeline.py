"""Host→HBM input pipeline: background decode threads + double-buffered
device prefetch (SURVEY.md §2.5 "Loader/prefetch").

The reference overlaps input with compute via DataLoader worker processes +
pinned-memory H2D copies (SURVEY.md §3.1 hot loop #1). TPU-native
equivalent: host threads decode uint8 batches; `prefetch_to_device` keeps
`size` batches resident in HBM ahead of the step (jax dispatch is async, so
the H2D copy of batch k+1 overlaps the compute of batch k); the fused
on-device `augment_batch` program turns the uint8 batch into the normalised
crop *on the chip*, so only small uint8 tensors cross the PCIe/host boundary
(4×1024×2048×3 uint8 = 24 MiB vs 96 MiB fp32).
"""

from __future__ import annotations

import collections
import itertools
import queue
import threading
import typing as tp

import jax
import numpy as np


def batch_iterator(
    dataset,            # indexable -> (image u8 HWC, label u8 HW)
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    num_threads: int = 4,
    epochs: int | None = None,
    label_lut: np.ndarray | None = None,
) -> tp.Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yield (images (B,H,W,3) uint8, labels (B,H,W) uint8) host batches,
    decoded by a thread pool that runs ahead of the consumer."""
    n = len(dataset)
    if n == 0:
        raise ValueError("empty dataset")
    rng = np.random.default_rng(seed)
    work: "queue.Queue[list[int] | None]" = queue.Queue(maxsize=4)
    done: "queue.Queue" = queue.Queue(maxsize=4)

    def producer():
        epoch_iter = itertools.count() if epochs is None else range(epochs)
        for _ in epoch_iter:
            order = rng.permutation(n) if shuffle else np.arange(n)
            stop = n - (n % batch_size) if drop_last else n
            for i in range(0, stop, batch_size):
                work.put(list(order[i:i + batch_size]))
        for _ in range(num_threads):
            work.put(None)

    def worker():
        while True:
            idxs = work.get()
            if idxs is None:
                done.put(None)
                return
            imgs, lbls = [], []
            for j in idxs:
                im, lb = dataset[j]
                if label_lut is not None:
                    lb = label_lut[lb]
                imgs.append(im)
                lbls.append(lb)
            done.put((np.stack(imgs), np.stack(lbls)))

    threading.Thread(target=producer, daemon=True).start()
    for _ in range(num_threads):
        threading.Thread(target=worker, daemon=True).start()

    finished = 0
    while finished < num_threads:
        item = done.get()
        if item is None:
            finished += 1
            continue
        yield item


def prefetch_to_device(
    iterator: tp.Iterator,
    *,
    size: int = 2,
    sharding: jax.sharding.Sharding | None = None,
) -> tp.Iterator:
    """Keep `size` batches in flight in HBM (double-buffered for size=2).

    `jax.device_put` is async; by putting batch k+size while yielding batch
    k, the H2D transfer and any on-device transform overlap the train step.
    With a `sharding`, each host batch is laid out across the mesh's data
    axis directly (per-device shards land on their chips without a gather).
    """
    buf = collections.deque()

    def put(x):
        if sharding is not None:
            return jax.tree.map(lambda a: jax.device_put(a, sharding), x)
        return jax.tree.map(jax.device_put, x)

    for item in iterator:
        buf.append(put(item))
        if len(buf) > size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def train_input_pipeline(
    dataset,
    batch_size: int,
    augment_cfg,
    *,
    key: jax.Array,
    label_lut: np.ndarray | None = None,
    sharding: jax.sharding.Sharding | None = None,
    prefetch: int = 2,
    **loader_kwargs,
) -> tp.Iterator[tuple[jax.Array, jax.Array]]:
    """Full train pipeline: host decode → HBM prefetch → fused on-device
    augmentation. Yields (normalised images, int32 labels) ready for the
    train step."""
    from torch_semantic_segmentation_tpu.data.transforms import augment_batch

    host = batch_iterator(dataset, batch_size, label_lut=label_lut,
                          **loader_kwargs)
    dev = prefetch_to_device(host, size=prefetch, sharding=sharding)
    for step_idx, (images, labels) in enumerate(dev):
        k = jax.random.fold_in(key, step_idx)
        yield augment_batch(images, labels, k, augment_cfg)
