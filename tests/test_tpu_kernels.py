"""On-chip (`-m tpu`) Pallas kernel parity tier.

The CPU suite exercises every kernel in interpret mode, but interpret
mode cannot reach Mosaic lowering — all of round 3's kernel compile
bugs (negative ref indices, bf16 cmpf, 32-bit strided-load rules) were
Mosaic-only. This tier compiles and checks the kernels on the REAL TPU
via a subprocess (tests/tpu_kernel_worker.py), because conftest.py pins
the pytest process itself to CPU before any test imports.

Run: python -m pytest tests/ -q -m tpu      (skips cleanly off-TPU)
Expected wall time: ~2 min warm cache, ~6 min cold (Mosaic compiles).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.tpu
def test_kernels_on_chip():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "tpu_kernel_worker.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    out = proc.stdout + proc.stderr
    if proc.returncode == 42:
        pytest.skip(f"no TPU attached: {out.splitlines()[-1] if out else ''}")
    assert proc.returncode == 0, out[-3000:]
    assert "ALL TPU KERNEL CHECKS OK" in out
