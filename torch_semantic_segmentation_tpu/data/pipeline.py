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
import queue
import threading
import typing as tp

import jax
import numpy as np


def epoch_order(n: int, epoch: int, *, seed: int = 0,
                shuffle: bool = True) -> np.ndarray:
    """Deterministic per-epoch sample order: a fresh permutation seeded by
    (seed, epoch), so any point of the stream is reconstructable from the
    (seed, batch-sequence-number) pair alone — the contract resume relies on
    (and the torch DataLoader per-epoch-reshuffle equivalent)."""
    if not shuffle:
        return np.arange(n)
    return np.random.default_rng((seed, epoch)).permutation(n)


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
    start_batch: int = 0,
    sample_slice: tuple[int, int] | None = None,
) -> tp.Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yield (images (B,H,W,3) uint8, labels (B,H,W) uint8) host batches,
    decoded by a thread pool that runs ahead of the consumer.

    Deterministic: batch k of a (dataset, batch_size, seed) stream is always
    the same, independent of num_threads — workers decode concurrently but a
    reorder buffer publishes strictly by sequence number. `start_batch`
    fast-forwards to batch k without decoding the skipped ones (resume:
    checkpointed step == batches consumed). `sample_slice=(lo, hi)` decodes
    only that slice of each batch's sample list — the multi-host contract
    (parallel.distributed): every process sees the same global order but
    does 1/num_hosts of the decode work."""
    n = len(dataset)
    if n == 0:
        raise ValueError("empty dataset")
    if drop_last:
        batches_per_epoch = n // batch_size
    else:
        batches_per_epoch = -(-n // batch_size)
    if batches_per_epoch == 0:
        raise ValueError(f"dataset ({n}) smaller than batch ({batch_size}) "
                         "with drop_last")
    end = None if epochs is None else epochs * batches_per_epoch

    work: "queue.Queue[tuple[int, list[int]] | None]" = queue.Queue(maxsize=4)
    done: "queue.Queue" = queue.Queue(maxsize=max(4, num_threads + 2))

    def producer():
        order, order_epoch = None, -1
        seq = start_batch
        while end is None or seq < end:
            epoch, b = divmod(seq, batches_per_epoch)
            if epoch != order_epoch:
                order = epoch_order(n, epoch, seed=seed, shuffle=shuffle)
                order_epoch = epoch
            i = b * batch_size
            work.put((seq, list(order[i:i + batch_size])))
            seq += 1
        for _ in range(num_threads):
            work.put(None)

    def worker():
        while True:
            item = work.get()
            if item is None:
                done.put(None)
                return
            seq, idxs = item
            if sample_slice is not None:
                idxs = idxs[sample_slice[0]:sample_slice[1]]
            imgs, lbls = [], []
            for j in idxs:
                im, lb = dataset[j]
                if label_lut is not None:
                    lb = label_lut[lb]
                imgs.append(im)
                lbls.append(lb)
            done.put((seq, (np.stack(imgs), np.stack(lbls))))

    threading.Thread(target=producer, daemon=True).start()
    for _ in range(num_threads):
        threading.Thread(target=worker, daemon=True).start()

    # reorder buffer: workers finish out of order; publish strictly by seq
    pending: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    next_seq = start_batch
    finished = 0
    while finished < num_threads:
        while next_seq in pending:
            yield pending.pop(next_seq)
            next_seq += 1
        item = done.get()
        if item is None:
            finished += 1
            continue
        seq, batch = item
        pending[seq] = batch
    while next_seq in pending:
        yield pending.pop(next_seq)
        next_seq += 1


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
