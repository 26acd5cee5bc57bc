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
@pytest.mark.slowest
def test_enet_converges_on_shapes(tmp_path, capsys):
    """~14 min on the idle 1-core host."""
    ckpt = _train_shapes("enet", 300, tmp_path)
    miou = _best_miou(capsys)
    assert miou > 70.0, f"ENet best val mIoU {miou:.2f} < 70 after 300 steps"
    # best-checkpoint selection kept a checkpoint under <dir>/best
    assert os.path.isdir(os.path.join(ckpt, "best"))


@pytest.mark.slow
@pytest.mark.slowest
def test_fastscnn_converges_on_shapes(tmp_path, capsys):
    """~12 min on the idle 1-core host."""
    _train_shapes("fastscnn", 400, tmp_path)
    miou = _best_miou(capsys)
    assert miou > 70.0, f"FastSCNN best val mIoU {miou:.2f} < 70 after 400 steps"


@pytest.mark.slow
@pytest.mark.slowest
def test_unet_converges_on_shapes(tmp_path, capsys):
    """BASELINE config 3 is UNet (transposed-conv decoder + skip concats,
    CamVid-style training); rounds 1-2 proved its torch parity and the
    Pallas skip-fusion numerics but never trained it to accuracy. UNet at
    full decoder resolution is the strongest model on shapes — TPU
    calibration 99.69 val mIoU @200 steps (2026-08-19), so the 70
    threshold leaves a wide margin; the CPU-tier run passed it green the
    same day. ~15 min on the idle 1-core host."""
    _train_shapes("unet", 200, tmp_path)
    miou = _best_miou(capsys)
    assert miou > 70.0, f"UNet best val mIoU {miou:.2f} < 70 after 200 steps"


@pytest.mark.slow
@pytest.mark.slowest
def test_icnet_aux_converges_on_shapes(tmp_path, capsys):
    """ICNet trained through its cascade-label-guidance aux heads
    (BASELINE config 5 names BiSeNet/ICNet; the BiSeNet test covers the
    context-path aux pattern, this covers the cascade pattern — three
    resolution branches supervised at 1/16, 1/8, 1/4 of the input).
    Threshold 60, not 70: ICNet's finest supervised head is 1/4-res and
    its main branch runs a dilated ResNet-50 on the 1/4 image (16×16 at
    these crops), which caps thin-structure IoU on shapes the same way
    DeepLab's OS8 grid does. TPU calibration 86.93 val mIoU @300 steps
    (2026-08-19); the CPU-tier run passed the threshold green the same
    day. ~45 min on the idle 1-core host."""
    _train_shapes("icnet", 300, tmp_path, extra=["--aux-weight", "0.4"])
    miou = _best_miou(capsys)
    assert miou > 60.0, \
        f"ICNet(aux) best val mIoU {miou:.2f} < 60 after 300 steps"


@pytest.mark.slow
@pytest.mark.slowest
def test_deeplab_ohem_converges_on_shapes(tmp_path, capsys):
    """DeepLab-r18 trained THROUGH OHEM selection (VERDICT r2 next #2a;
    BASELINE config 4 pairs deeplab+OHEM): hard-example mining must not
    break the gradient path — val mIoU rises well above chance (~15).
    min_kept=1024 of 8·64·64=32768 batch pixels, so OHEM genuinely
    selects (it is NOT degenerate plain CE: at most the hardest 3% of
    pixels carry gradient).

    Threshold 60, NOT the 70 the FCN-style models use: DeepLab-r18 at
    OS8 predicts on an 8×8 grid at 64² crops, which caps boundary/thin-
    structure IoU on shapes (worst class is 'stripe'). Calibrated on
    CPU: plain-CE control 64.3 @300 (same plateau — the ceiling is the
    architecture, not OHEM); OHEM 65.4 @300 (min_kept=1024) and 65.2
    @400 (min_kept=4096), i.e. OHEM matches/beats plain CE while
    selecting. ~25 min on the idle 1-core host."""
    _train_shapes("deeplabv3_resnet18", 300, tmp_path,
                  extra=["--loss", "ohem", "--ohem-min-kept", "1024"])
    miou = _best_miou(capsys)
    assert miou > 60.0, \
        f"DeepLab-r18+OHEM best val mIoU {miou:.2f} < 60 after 300 steps"


@pytest.mark.slow
@pytest.mark.slowest
def test_bisenet_aux_converges_on_shapes(tmp_path, capsys):
    """BiSeNet trained with ACTIVE aux heads (aux_weight 0.4; VERDICT r2
    next #2b; BASELINE config 5), then multi-scale(+flip) eval on the best
    checkpoint must not degrade vs single-scale (exercises the value of
    the multi-scale evaluator, not just its equality plumbing).
    Calibrated on CPU @300 steps: post-train eval single-scale 88.81,
    multi-scale 91.87 (threshold 70). ~25 min on the idle 1-core host."""
    from torch_semantic_segmentation_tpu.cli.eval import main as eval_main

    ckpt = _train_shapes("bisenet", 300, tmp_path,
                         extra=["--aux-weight", "0.4"])
    miou = _best_miou(capsys)
    assert miou > 70.0, \
        f"BiSeNet(aux) best val mIoU {miou:.2f} < 70 after 300 steps"

    best = os.path.join(ckpt, "best")
    common = ["--dataset", "shapes", "--model", "bisenet",
              "--batch-size", "8", "--checkpoint", best, "--max-batches", "4"]
    _, ss = eval_main(common)
    _, ms = eval_main(common + ["--multi-scale",
                                "--scales", "0.75", "1.0", "1.25"])
    assert ms >= ss - 0.02, \
        f"multi-scale eval {100 * ms:.2f} degraded vs single {100 * ss:.2f}"


@pytest.mark.slow
def test_eval_every_multi_scale_wiring(tmp_path, capsys):
    """--eval-multi-scale routes in-training validation through the
    multi-scale(+flip) evaluator (VERDICT r2 missing #6; BASELINE config 5
    pairs multi-scale eval with the aux-head models). Wiring-only — the
    accuracy value of multi-scale eval is asserted by
    test_bisenet_aux_converges_on_shapes (~2.5 min: compile-dominated)."""
    from torch_semantic_segmentation_tpu.cli.train import main

    state = main(["--dataset", "shapes", "--model", "enet",
                  "--batch-size", "8", "--crop-size", "32",
                  "--max-iterations", "2", "--eval-every", "2",
                  "--eval-batches", "1", "--log-every", "1",
                  "--eval-multi-scale", "--eval-scales", "0.75", "1.0"])
    assert int(state.step) == 2
    best = _best_miou(capsys)
    assert np.isfinite(best) and 0.0 <= best <= 100.0


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
