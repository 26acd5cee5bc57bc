"""Test config: force CPU with 8 fake devices (SURVEY.md §4.4) so
data-parallel sharding tests run without TPU hardware, and so the
precision-sensitive fp32 torch-oracle tests don't hit the TPU's bf16 MXU
passes.

Note: this image's sitecustomize imports jax at interpreter startup (to
register the 'axon' TPU plugin), so env vars set here are too late for
jax's import-time config read — we must go through jax.config before the
backend initialises.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert jax.device_count() == 8, jax.devices()
