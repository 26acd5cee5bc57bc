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


def check_spatial_extent(input_h: int, num_spatial: int,
                         max_stride: int = 32) -> None:
    """Guard against DEGENERATE spatial shards (found round 4, f64
    equality sweep): when a network's deepest feature map has fewer rows
    than the 'spatial' mesh axis (input_h / max_stride < num_spatial —
    some shards hold only padding), the FORWARD stays correct but XLA
    GSPMD overcounts the conv kernel/BN gradients at that stage by
    exactly the axis size (measured: 4.000× on the H=2-over-4-shards
    1/32 stage dw kernels, 2.000× on its 1×1s, poisoning every upstream
    gradient; one row per shard is already exact to reassociation).
    Call before sharding H over 'spatial'; raises ValueError.

    Reference counterpart: none — the reference is DP-only (SURVEY.md
    §2.4); this guards OUR spatial-partitioning extension.
    """
    deepest = input_h // max_stride
    if deepest < num_spatial:
        raise ValueError(
            f"degenerate spatial sharding: input H={input_h} reaches "
            f"H={deepest} at stride {max_stride}, smaller than the "
            f"spatial mesh axis ({num_spatial}) — empty shards make XLA "
            f"GSPMD overcount that stage's backward by the axis size. "
            f"Use input H ≥ {max_stride * num_spatial} or fewer spatial "
            f"shards.")


def hybrid_data_parallel_mesh(
    num_slices: int | None = None,
    devices: tp.Sequence[jax.Device] | None = None,
) -> Mesh:
    """Multi-slice mesh ('dcn_data', 'data') for scaling past one TPU slice
    (SURVEY.md §2.4 "Communication backend": ICI intra-slice, DCN
    inter-slice). Shard batches over BOTH axes — P(("dcn_data", "data")) —
    and GSPMD decomposes the gradient all-reduce into an intra-slice ICI
    reduce-scatter/all-gather plus a small inter-slice DCN all-reduce.

    `num_slices` defaults to the distinct `slice_index` of visible devices
    (1 on a single slice or CPU, where the mesh degenerates to plain DP).
    """
    devices = list(devices) if devices is not None else jax.devices()
    if num_slices is None:
        num_slices = len({getattr(d, "slice_index", 0) for d in devices})
    n = len(devices)
    if n % num_slices:
        raise ValueError(f"{n} devices not divisible by {num_slices} slices")
    per_slice = n // num_slices
    if num_slices > 1 and hasattr(devices[0], "slice_index"):
        from jax.experimental import mesh_utils
        arr = mesh_utils.create_hybrid_device_mesh(
            (per_slice,), (num_slices,), devices=devices)
        arr = np.asarray(arr).reshape(num_slices, per_slice)
    else:
        arr = np.array(devices).reshape(num_slices, per_slice)
    return Mesh(arr, ("dcn_data", "data"))


def hybrid_batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch over both data axes of a hybrid mesh."""
    return NamedSharding(mesh, P(("dcn_data", "data")))


def batch_sharding(mesh: Mesh, *, spatial_dim: int | None = None,
                   input_extent: int | None = None,
                   max_stride: int = 32) -> NamedSharding:
    """Sharding for NHWC batches: N over 'data', optionally H over 'spatial'.

    Sharding a spatial dim is gated by `check_spatial_extent` (round-4
    finding: shards smaller than the deepest feature map silently
    overcount the backward by the axis size — measured 4.000×). When
    `spatial_dim` is set and the mesh's 'spatial' axis is >1, the input
    extent along that dim is REQUIRED so the guard runs here, at the
    public helper, not as an optional extra call (`shard_batch` derives
    it from the array shape automatically). `max_stride` is the
    network's deepest downsampling factor (32 covers every zoo model)."""
    if spatial_dim is None:
        return NamedSharding(mesh, P("data"))
    n_spatial = dict(zip(mesh.axis_names, mesh.devices.shape)).get("spatial", 1)
    if n_spatial > 1:
        if input_extent is None:
            raise ValueError(
                "batch_sharding(spatial_dim=...) over a >1 'spatial' axis "
                "requires input_extent=<size of the sharded dim> so the "
                "degenerate-shard guard can run (empty shards at the "
                "deepest stage corrupt gradients by the axis size — see "
                "check_spatial_extent). Or use shard_batch, which reads "
                "the extent off the array.")
        check_spatial_extent(input_extent, n_spatial, max_stride=max_stride)
    spec = [None, None, None, None]
    spec[0] = "data"
    spec[spatial_dim] = "spatial"
    return NamedSharding(mesh, P(*spec))


def label_sharding(mesh: Mesh, *, spatial: bool = False) -> NamedSharding:
    if spatial:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P("data"))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh (params / opt state).

    Works on multi-host meshes too: there `device_put` can't target
    non-addressable devices, so each process contributes its (identical —
    same seed) host copy via `make_array_from_process_local_data`."""
    sh = NamedSharding(mesh, P())
    if any(d.process_index != jax.process_index()
           for d in mesh.devices.flat):
        import jax.numpy as jnp
        import numpy as np

        def put(x):
            if (hasattr(x, "dtype")
                    and jnp.issubdtype(x.dtype, jax.dtypes.prng_key)):
                kd = jax.make_array_from_process_local_data(
                    sh, np.asarray(jax.random.key_data(x)))
                return jax.random.wrap_key_data(
                    kd, impl=jax.random.key_impl(x))
            return jax.make_array_from_process_local_data(
                sh, np.asarray(x))
        return jax.tree.map(put, tree)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_batch(batch, mesh: Mesh, *, spatial: bool = False,
                max_stride: int = 32):
    """Place (images NHWC, labels NHW) across the mesh. With
    `spatial=True` the H extent is validated against the 'spatial' axis
    (degenerate-shard guard — see `batch_sharding`)."""
    images, labels = batch
    images = jax.device_put(
        images, batch_sharding(
            mesh, spatial_dim=1 if spatial else None,
            input_extent=images.shape[1] if spatial else None,
            max_stride=max_stride))
    labels = jax.device_put(labels, label_sharding(mesh, spatial=spatial))
    return images, labels
