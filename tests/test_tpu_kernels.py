"""On-chip (`-m tpu`) Pallas kernel parity tier — one test per kernel
family (VERDICT r3 next #5: a Mosaic regression names its kernel and the
other families still report, instead of one monolithic blob).

The CPU suite exercises every kernel in interpret mode, but interpret
mode cannot reach Mosaic lowering — all of round 3's kernel compile
bugs (negative ref indices, bf16 cmpf, 32-bit strided-load rules) were
Mosaic-only. Each family compiles and checks on the REAL TPU via a
subprocess (tests/tpu_kernel_worker.py <family>), because conftest.py
pins the pytest process itself to CPU before any test imports.

Run: python -m pytest tests/ -q -m tpu      (skips cleanly off-TPU)
Measured wall time at HEAD (2026-08-20, axon v5lite, warm Mosaic
cache): ~3.5 min for all five families; cold cache adds the Mosaic
compiles (~2× on the first run).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAMILIES = ["mbconv", "dw", "resize_ce", "upsample", "sepconv"]


@pytest.mark.tpu
@pytest.mark.parametrize("family", FAMILIES)
def test_kernels_on_chip(family):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "tpu_kernel_worker.py"),
         family],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    out = proc.stdout + proc.stderr
    if proc.returncode == 42:
        pytest.skip(f"no TPU attached: {out.splitlines()[-1] if out else ''}")
    assert proc.returncode == 0, out[-3000:]
    assert f"TPU KERNEL CHECKS OK: {family}" in out
