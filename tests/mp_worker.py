"""Worker for the 2-process × 4-fake-device multi-host test
(tests/test_multiprocess.py; VERDICT r1 next #5).

Each process joins the jax.distributed cluster (gloo collectives on CPU),
builds the identical model/optimizer from a fixed seed, feeds its half of
every deterministic global batch via
parallel.distributed.local_batch_iterator, and runs N GSPMD train steps
over the global 8-device mesh. Prints the final loss and a param checksum
for the parent to compare against the single-process DP-8 run.
"""

import os
import sys

# per-process fake devices BEFORE the backend initialises (XLA_FLAGS is
# read lazily at backend creation, so setting it here still works)
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

# this image's sitecustomize imports jax at interpreter startup, so the
# JAX_PLATFORMS env var is read too early to help — force CPU through
# jax.config before any backend use (same dance as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402
from flax import nnx  # noqa: E402


def main():
    coord, nproc, pid, steps = (sys.argv[1], int(sys.argv[2]),
                                int(sys.argv[3]), int(sys.argv[4]))
    from torch_semantic_segmentation_tpu.parallel import distributed as dist
    dist.initialize(coordinator_address=coord, num_processes=nproc,
                    process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc * 4

    import jax.numpy as jnp
    from torch_semantic_segmentation_tpu.data.synthetic import ShapesDataset
    from torch_semantic_segmentation_tpu.models import enet
    from torch_semantic_segmentation_tpu.parallel.mesh import (
        data_parallel_mesh, replicate)
    from torch_semantic_segmentation_tpu.train import (
        OptimizerConfig, create_train_state, make_train_step)

    model = enet(num_classes=4, rngs=nnx.Rngs(0))
    tx = OptimizerConfig(lr=0.05, max_steps=100).make()
    gd_train, _, state = create_train_state(model, tx)

    mesh = data_parallel_mesh()          # 8 global devices
    assert mesh.shape["data"] == nproc * 4
    state = replicate(state, mesh)
    step = make_train_step(gd_train, tx, donate=False)

    ds = ShapesDataset(64, 32, 32, seed=0)
    it = dist.local_batch_iterator(ds, global_batch=8, mesh=mesh, seed=0)

    loss = None
    for _ in range(steps):
        images, labels = next(it)
        images = jnp.asarray(images, jnp.float32) / 127.5 - 1.0
        state, metrics = step(state, images, jnp.asarray(labels, jnp.int32))
        loss = float(metrics["loss"])

    checksum = float(sum(np.abs(np.asarray(x)).sum()
                         for x in jax.tree.leaves(state.params)))
    if jax.process_index() == 0:
        print(f"MP_RESULT loss={loss:.8f} checksum={checksum:.6f}")


if __name__ == "__main__":
    main()
