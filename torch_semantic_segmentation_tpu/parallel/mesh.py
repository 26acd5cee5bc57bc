"""Mesh construction and sharding helpers (SURVEY.md §2.4).

Axes:
- 'data'    — batch dimension; gradient all-reduce (psum) over ICI.
- 'spatial' — optional: activation H dimension for full-res 1024×2048 maps
  (the image analog of context parallelism, SURVEY.md §5 "long-context");
  XLA:SPMD inserts conv halo exchanges automatically.

Everything here only *annotates* placement; the collectives are compiled
into the jitted step by GSPMD.
"""

from __future__ import annotations

import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(num_data: int | None = None, num_spatial: int = 1,
                       devices: tp.Sequence[jax.Device] | None = None) -> Mesh:
    """Mesh of shape (data, spatial). Defaults to all devices on 'data'."""
    devices = list(devices) if devices is not None else jax.devices()
    if num_data is None:
        num_data = len(devices) // num_spatial
    n = num_data * num_spatial
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(num_data, num_spatial)
    return Mesh(arr, ("data", "spatial"))


def batch_sharding(mesh: Mesh, *, spatial_dim: int | None = None) -> NamedSharding:
    """Sharding for NHWC batches: N over 'data', optionally H over 'spatial'."""
    if spatial_dim is None:
        return NamedSharding(mesh, P("data"))
    spec = [None, None, None, None]
    spec[0] = "data"
    spec[spatial_dim] = "spatial"
    return NamedSharding(mesh, P(*spec))


def label_sharding(mesh: Mesh, *, spatial: bool = False) -> NamedSharding:
    if spatial:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P("data"))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh (params / opt state)."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_batch(batch, mesh: Mesh, *, spatial: bool = False):
    """Place (images NHWC, labels NHW) across the mesh."""
    images, labels = batch
    images = jax.device_put(
        images, batch_sharding(mesh, spatial_dim=1 if spatial else None))
    labels = jax.device_put(labels, label_sharding(mesh, spatial=spatial))
    return images, labels
