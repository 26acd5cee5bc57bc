"""Multi-host (multi-process) runtime wiring (SURVEY.md §2.4/§3.5;
VERDICT r1 next #5).

The reference ran one-process-per-GPU DDP with an NCCL rendezvous
(SURVEY.md §3.5). The TPU-native equivalent is one process per *host*:

- `initialize()` wraps `jax.distributed.initialize` (the JAX coordination
  service rendezvous — TPU pods auto-discover; explicit args for CPU tests
  or manual clusters). After it, `jax.devices()` spans every host and the
  ordinary GSPMD train step works unchanged — collectives ride ICI/DCN.
- `global_batch_from_local()` builds a *globally sharded* jax.Array from
  each process's host-local numpy shard via
  `jax.make_array_from_process_local_data` — no host ever materialises the
  full global batch.
- `local_shard_range()` tells each process which slice of a global batch it
  must feed, matching the deterministic (seed, epoch)-keyed order of
  `data.pipeline.batch_iterator`, so every process decodes only 1/num_hosts
  of the input work and the assembled global stream is bit-identical to the
  single-process stream.

On CPU, multi-process collectives need gloo:
`jax.config.update("jax_cpu_collectives_implementation", "gloo")` before
`initialize()` (tests/test_multiprocess.py does this).
"""

from __future__ import annotations

import os
import typing as tp

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: tp.Sequence[int] | None = None,
) -> None:
    """Join the multi-process JAX cluster (idempotent for 1 process).

    With no args, relies on the environment (TPU pod metadata, or the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID variables)
    — the standard launcher contract. Single-process callers may simply not
    call this at all.
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def local_shard_range(global_batch: int) -> tuple[int, int]:
    """[lo, hi) sample slice of each global batch this process feeds.

    The deterministic stream contract (data.pipeline.epoch_order) defines
    global batch k's sample indices; process p decodes samples
    [p*per, (p+1)*per) of that list. Requires global_batch %
    process_count == 0.
    """
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{n} processes")
    per = global_batch // n
    p = jax.process_index()
    return p * per, (p + 1) * per


def global_batch_from_local(
    local_batch,                      # pytree of np arrays, leading dim local
    mesh: jax.sharding.Mesh,
    spec: P = P(("data",)),
) -> tp.Any:
    """Assemble a globally-sharded jax.Array batch from per-process host
    shards. Each process passes only its own samples; the result behaves as
    the full global batch inside jit (GSPMD sees the global shape)."""
    sharding = NamedSharding(mesh, spec)

    def put(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    return jax.tree.map(put, local_batch)


def local_batch_iterator(
    dataset,
    global_batch: int,
    *,
    mesh: jax.sharding.Mesh,
    label_lut: np.ndarray | None = None,
    start_batch: int = 0,
    native: bool = False,
    **loader_kwargs,
):
    """Multi-host input pipeline: every process decodes its slice of each
    deterministic global batch and assembles the global sharded array.

    Yields (images, labels) jax.Arrays with GLOBAL batch dimension, sharded
    over the mesh's 'data' axis. The underlying per-process decode uses the
    same (seed, epoch)-keyed order on every host, so resume/fast-forward
    semantics match the single-process batch_iterator exactly.

    `native=True` routes the per-process decode through the C++ loader
    (data.native_loader) instead of the Python thread pool — same
    sample-slice contract, same deterministic (seed, epoch) stream as the
    single-process native loader (the shuffled order differs from the
    Python loader's, but is identical across processes and across restarts
    for a given seed).
    """
    lo, hi = local_shard_range(global_batch)
    if native:
        from torch_semantic_segmentation_tpu.data.native_loader import (
            native_batch_iterator)
        host = native_batch_iterator(
            dataset, global_batch, label_lut=label_lut,
            start_batch=start_batch, sample_slice=(lo, hi), **loader_kwargs)
    else:
        from torch_semantic_segmentation_tpu.data.pipeline import (
            batch_iterator)
        host = batch_iterator(dataset, global_batch, label_lut=label_lut,
                              start_batch=start_batch,
                              sample_slice=(lo, hi), **loader_kwargs)
    for images, labels in host:
        yield global_batch_from_local((images, labels), mesh)
