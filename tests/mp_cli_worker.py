"""Worker for the multihost TRAIN-CLI test: runs the real
`cli.train.main` under a 2-process gloo cluster (coordinator/process id
from JAX_* env vars, read by parallel.distributed.initialize)."""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

# sitecustomize imports jax before us — force CPU via config, not env
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from torch_semantic_segmentation_tpu.cli.train import main  # noqa: E402

if __name__ == "__main__":
    main(sys.argv[1:])
