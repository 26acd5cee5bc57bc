"""CLI + checkpoint/resume integration tests (SURVEY.md §4.3; the
CPU-runnable contract config is the anchor)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_train_cli_synthetic_smoke(tmp_path):
    from torch_semantic_segmentation_tpu.cli.train import main
    ckpt = str(tmp_path / "ck")
    state = main(["--dataset", "synthetic", "--model", "enet",
                  "--batch-size", "8", "--crop-size", "32",
                  "--max-iterations", "3", "--log-every", "1",
                  "--checkpoint-dir", ckpt, "--checkpoint-every", "2"])
    assert int(state.step) == 3
    assert os.path.isdir(ckpt)
    # resume continues from the saved step
    state = main(["--dataset", "synthetic", "--model", "enet",
                  "--batch-size", "8", "--crop-size", "32",
                  "--max-iterations", "5", "--log-every", "1",
                  "--checkpoint-dir", ckpt, "--resume"])
    assert int(state.step) == 5


@pytest.mark.slow
def test_train_then_eval_cli_checkpoint(tmp_path):
    """Regression (ADVICE r1 high): eval --checkpoint on a dir written by the
    train CLI must restore even though eval never reconstructs training's
    exact optax chain (SGD+decay saves a 3-element chain state)."""
    from torch_semantic_segmentation_tpu.cli.eval import main as eval_main
    from torch_semantic_segmentation_tpu.cli.train import main as train_main

    ckpt = str(tmp_path / "ck")
    train_main(["--dataset", "synthetic", "--model", "enet",
                "--batch-size", "8", "--crop-size", "32",
                "--max-iterations", "2", "--log-every", "1",
                "--checkpoint-dir", ckpt, "--checkpoint-every", "1"])
    iou, miou = eval_main(["--dataset", "synthetic", "--model", "enet",
                           "--batch-size", "2", "--max-batches", "1",
                           "--checkpoint", ckpt])
    assert np.isfinite(miou)

    # wrong-model template must be rejected loudly, not mis-restored
    with pytest.raises(ValueError, match="wrong model"):
        eval_main(["--dataset", "synthetic", "--model", "fastscnn",
                   "--batch-size", "2", "--max-batches", "1",
                   "--checkpoint", ckpt])


@pytest.mark.slow
def test_train_cli_fused_resize_aux_heads(tmp_path):
    """CLI path for the SegLoss protocol (VERDICT r2 next #6): an aux-head
    model (BiSeNet: heads at 1/8, 1/8, 1/16 when upsample_logits=False)
    trained with --fused-resize-loss — the fused lane-major loss must
    resize each mixed-resolution head itself and produce a finite loss."""
    from torch_semantic_segmentation_tpu.cli.train import main
    state = main(["--dataset", "synthetic", "--model", "bisenet",
                  "--batch-size", "8", "--crop-size", "64",
                  "--fused-resize-loss",
                  "--max-iterations", "2", "--log-every", "1"])
    assert int(state.step) == 2


@pytest.mark.slow
def test_train_cli_fused_resize_ohem(tmp_path):
    """resize-OHEM CLI variant: --loss ohem + --fused-resize-loss (was a
    hard ValueError before round 3)."""
    from torch_semantic_segmentation_tpu.cli.train import main
    state = main(["--dataset", "synthetic", "--model", "fastscnn",
                  "--batch-size", "8", "--crop-size", "64",
                  "--loss", "ohem", "--ohem-min-kept", "64",
                  "--fused-resize-loss",
                  "--max-iterations", "2", "--log-every", "1"])
    assert int(state.step) == 2


def test_eval_cli_synthetic_smoke():
    from torch_semantic_segmentation_tpu.cli.eval import main
    iou, miou = main(["--dataset", "synthetic", "--model", "enet",
                      "--batch-size", "2", "--max-batches", "1"])
    assert np.isfinite(miou)
    assert len(iou) == 19


def test_checkpoint_roundtrip_exact(tmp_path):
    from flax import nnx
    from torch_semantic_segmentation_tpu.checkpoint import CheckpointManager
    from torch_semantic_segmentation_tpu.models import enet
    from torch_semantic_segmentation_tpu.train import (
        OptimizerConfig, create_train_state)
    import jax

    tx = OptimizerConfig(max_steps=10).make()
    _, _, state = create_train_state(enet(5, rngs=nnx.Rngs(3)), tx)

    mgr = CheckpointManager(str(tmp_path / "ck"), save_interval_steps=1)
    key = jax.random.key(42)
    assert mgr.save(7, state, data_key=key, force=True)
    mgr.wait()

    _, _, template = create_train_state(enet(5, rngs=nnx.Rngs(0)), tx)
    restored, rkey, step = mgr.restore_latest(template, data_key=jax.random.key(0))
    assert step == 7
    assert jnp.array_equal(jax.random.key_data(rkey), jax.random.key_data(key))
    orig = jax.tree.leaves(state.params)
    back = jax.tree.leaves(restored.params)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


@pytest.mark.slow
def test_resume_is_bit_identical_to_uninterrupted(tmp_path):
    """Resume contract (VERDICT r1 next #4): train 5 steps straight vs
    train 3 + resume to 5 — identical params, because the data stream
    fast-forwards by step and the aug PRNG key is checkpointed."""
    import jax
    from torch_semantic_segmentation_tpu.cli.train import main

    base = ["--dataset", "synthetic", "--model", "enet",
            "--batch-size", "8", "--crop-size", "32", "--log-every", "10",
            # same LR-decay horizon in every phase (the interrupted run
            # stops at 3 of a planned 5 — the schedule must not re-derive
            # from its shorter --max-iterations)
            "--schedule-steps", "5"]
    straight = main(base + ["--max-iterations", "5"])

    ckpt = str(tmp_path / "ck")
    main(base + ["--max-iterations", "3",
                 "--checkpoint-dir", ckpt, "--checkpoint-every", "1"])
    resumed = main(base + ["--max-iterations", "5",
                           "--checkpoint-dir", ckpt, "--resume"])

    assert int(resumed.step) == 5
    for a, b in zip(jax.tree.leaves(straight.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_build_loss_variants():
    from torch_semantic_segmentation_tpu.cli.common import build_loss
    logits = jnp.zeros((1, 8, 8, 4))
    labels = jnp.zeros((1, 8, 8), jnp.int32)
    for loss in ("ce", "ohem"):
        fn = build_loss(loss, ignore_index=255, aux_weight=0.4,
                        class_weights=np.ones(4, np.float32),
                        ohem_min_kept=10)
        v = fn(logits, labels)
        assert jnp.isfinite(v)
        v2 = fn((logits, logits), labels)   # aux path
        assert v2 > v                        # main + 0.4*aux

    with pytest.raises(ValueError):
        build_loss("focal", ignore_index=255, aux_weight=0.4, class_weights=None)


@pytest.mark.slow
def test_train_cli_sigterm_saves_and_resumes(tmp_path):
    """Preemption-safe save hook (SURVEY.md §5): SIGTERM mid-run forces a
    checkpoint and a clean exit; --resume continues from that step."""
    import signal
    import threading

    from torch_semantic_segmentation_tpu.cli.train import main

    ckpt = str(tmp_path / "ck")
    # outer no-op handler: if the timer fires after main() restored the
    # previous handler (or returned), the stray signal must not kill pytest
    outer = signal.signal(signal.SIGTERM, lambda *a: None)
    timer = threading.Timer(
        5.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        state = main(["--dataset", "synthetic", "--model", "enet",
                      "--batch-size", "8", "--crop-size", "32",
                      "--max-iterations", "100000", "--log-every", "1",
                      "--checkpoint-dir", ckpt,
                      "--checkpoint-every", "1000000"])  # only the forced save
    finally:
        timer.cancel()
        signal.signal(signal.SIGTERM, outer)
    s0 = int(state.step)
    assert s0 < 100000, "SIGTERM did not interrupt the run"
    assert os.path.isdir(ckpt) and os.listdir(ckpt), "no forced checkpoint"

    state = main(["--dataset", "synthetic", "--model", "enet",
                  "--batch-size", "8", "--crop-size", "32",
                  "--max-iterations", str(s0 + 2), "--log-every", "1",
                  "--checkpoint-dir", ckpt, "--resume"])
    assert int(state.step) == s0 + 2
