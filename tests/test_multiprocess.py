"""Multi-host (multi-process) runtime test (VERDICT r1 next #5;
SURVEY.md §2.4/§3.5): 2 processes × 4 fake CPU devices with gloo
collectives must reproduce the single-process DP-8 train run — same
deterministic global batch stream (each process decodes only its slice),
same losses, same updated parameters.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STEPS = 3


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """DP-8 in this process (conftest gives 8 fake devices) over the SAME
    deterministic stream the workers assemble across processes."""
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from torch_semantic_segmentation_tpu.data.pipeline import batch_iterator
    from torch_semantic_segmentation_tpu.data.synthetic import ShapesDataset
    from torch_semantic_segmentation_tpu.models import enet
    from torch_semantic_segmentation_tpu.parallel.mesh import (
        batch_sharding, data_parallel_mesh, replicate)
    from torch_semantic_segmentation_tpu.train import (
        OptimizerConfig, create_train_state, make_train_step)

    model = enet(num_classes=4, rngs=nnx.Rngs(0))
    tx = OptimizerConfig(lr=0.05, max_steps=100).make()
    gd_train, _, state = create_train_state(model, tx)
    mesh = data_parallel_mesh()
    state = replicate(state, mesh)
    step = make_train_step(gd_train, tx, donate=False)
    sh = batch_sharding(mesh)

    it = batch_iterator(ShapesDataset(64, 32, 32, seed=0), 8, seed=0)
    loss = None
    for _ in range(STEPS):
        images, labels = next(it)
        images = jax.device_put(jnp.asarray(images), sh)
        labels = jax.device_put(jnp.asarray(labels, jnp.int32), sh)
        images = jnp.asarray(images, jnp.float32) / 127.5 - 1.0
        state, metrics = step(state, images, labels)
        loss = float(metrics["loss"])
    checksum = float(sum(np.abs(np.asarray(x)).sum()
                         for x in jax.tree.leaves(state.params)))
    return loss, checksum


@pytest.mark.slow
@pytest.mark.slowest
def test_two_process_dp_matches_single_process():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {**os.environ,
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
           "JAX_PLATFORMS": "cpu"}
    # workers set their own --xla_force_host_platform_device_count=4;
    # drop the parent suite's 8-device forcing from their XLA_FLAGS
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)

    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
         coord, "2", str(pid), str(STEPS)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    result = [ln for out in outs for ln in out.splitlines()
              if ln.startswith("MP_RESULT")]
    assert len(result) == 1, f"expected one MP_RESULT line:\n{outs}"
    kv = dict(tok.split("=") for tok in result[0].split()[1:])
    mp_loss, mp_checksum = float(kv["loss"]), float(kv["checksum"])

    ref_loss, ref_checksum = _single_process_reference()
    np.testing.assert_allclose(mp_loss, ref_loss, rtol=1e-5)
    np.testing.assert_allclose(mp_checksum, ref_checksum, rtol=1e-4)


CLI_ARGS = ["--dataset", "shapes", "--model", "enet", "--batch-size", "8",
            "--crop-size", "32", "--max-iterations", "3", "--log-every", "1",
            "--lr", "0.05", "--seed", "0", "--no-bf16"]


def _losses(out: str) -> list:
    losses = [float(ln.split("loss")[1].split()[0])
              for ln in out.splitlines() if ln.startswith("it ")]
    assert losses, f"no loss lines:\n{out}"
    return losses


@pytest.mark.slow
@pytest.mark.slowest
def test_multihost_train_cli_matches_single_process(capsys):
    """The real train CLI under --multihost (2 procs × 4 devices) must
    print the same per-step losses as the single-process CLI run — the
    full stack: dist.initialize, per-process slice decode, global-array
    assembly, replicated aug key, GSPMD step."""
    port = _free_port()
    env_base = {**os.environ,
                "PYTHONPATH": (REPO + os.pathsep
                               + os.environ.get("PYTHONPATH", "")),
                "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "JAX_NUM_PROCESSES": "2"}
    env_base["XLA_FLAGS"] = " ".join(
        f for f in env_base.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)

    procs = []
    for pid in (0, 1):
        env = {**env_base, "JAX_PROCESS_ID": str(pid)}
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_cli_worker.py"),
             "--multihost", *CLI_ARGS],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"CLI worker failed:\n{out}"
    mp = _losses(outs[0])

    # single-process reference through the same CLI (8 fake devices here)
    from torch_semantic_segmentation_tpu.cli.train import main
    main(CLI_ARGS)
    ref = _losses(capsys.readouterr().out)
    assert len(mp) == len(ref) == 3
    # step-1 loss is computed from identical params on the identically
    # assembled global batch → must match exactly (proves the multihost
    # stream/aug/forward path); later steps drift as the cross-host psum
    # legally reorders f32 gradient sums and SGD amplifies the rounding
    # (measured ~2e-4 by step 3; the bit-level runtime equality is pinned
    # by test_two_process_dp_matches_single_device)
    np.testing.assert_allclose(mp[0], ref[0], atol=1.1e-6)
    np.testing.assert_allclose(mp[1:], ref[1:], atol=2e-3)


def _write_mini_cityscapes(root, n=16, hw=(48, 64)):
    """Tiny on-disk Cityscapes-layout tree the native loader can decode."""
    import cv2
    rng = np.random.default_rng(0)
    img_dir = os.path.join(root, "leftImg8bit", "train", "x")
    lbl_dir = os.path.join(root, "gtFine", "train", "x")
    os.makedirs(img_dir)
    os.makedirs(lbl_dir)
    for i in range(n):
        img = rng.integers(0, 256, (*hw, 3), np.uint8)
        lbl = rng.integers(0, 34, hw, np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"x_{i:03d}_leftImg8bit.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(lbl_dir, f"x_{i:03d}_gtFine_labelIds.png"),
                    lbl)


@pytest.mark.slow
@pytest.mark.slowest
def test_multihost_native_loader_matches_single_process(tmp_path, capsys):
    """--multihost --native-loader (VERDICT r2 next #5): each process's C++
    loader decodes its sample_slice of the deterministic global stream
    from a real on-disk Cityscapes-layout tree; per-step losses must match
    the single-process --native-loader run (same (seed, epoch) C++ shuffle
    order on both sides). ~6 min on the idle 1-core host."""
    from torch_semantic_segmentation_tpu.data import native_loader
    if not native_loader.native_available():
        pytest.skip("native loader not built")
    _write_mini_cityscapes(str(tmp_path))

    args = ["--dataset", "cityscapes", "--dataset-dir", str(tmp_path),
            "--model", "enet", "--batch-size", "8", "--crop-size", "32",
            "--max-iterations", "3", "--log-every", "1", "--lr", "0.05",
            "--seed", "0", "--no-bf16", "--native-loader"]

    port = _free_port()
    env_base = {**os.environ,
                "PYTHONPATH": (REPO + os.pathsep
                               + os.environ.get("PYTHONPATH", "")),
                "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "JAX_NUM_PROCESSES": "2"}
    env_base["XLA_FLAGS"] = " ".join(
        f for f in env_base.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)

    procs = []
    for pid in (0, 1):
        env = {**env_base, "JAX_PROCESS_ID": str(pid)}
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_cli_worker.py"),
             "--multihost", *args],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"CLI worker failed:\n{out}"
    mp = _losses(outs[0])

    from torch_semantic_segmentation_tpu.cli.train import main
    main(args)
    ref = _losses(capsys.readouterr().out)
    assert len(mp) == len(ref) == 3
    # same tolerance rationale as the Python-loader variant above
    np.testing.assert_allclose(mp[0], ref[0], atol=1.1e-6)
    np.testing.assert_allclose(mp[1:], ref[1:], atol=2e-3)
