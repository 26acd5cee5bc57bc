"""Predict CLI tests: the user-facing inference surface (serving path over
image files; SURVEY.md §0 "loadable pretrained weights")."""

import os

import numpy as np
import pytest


def _write_png(path, h, w, seed):
    import cv2
    rng = np.random.default_rng(seed)
    cv2.imwrite(str(path), rng.integers(0, 256, (h, w, 3), dtype=np.uint8))


def test_collect_images_and_palettes(tmp_path):
    from torch_semantic_segmentation_tpu.cli.predict import (
        auto_palette, collect_images)
    from torch_semantic_segmentation_tpu.data import camvid, cityscapes

    d = tmp_path / "frames"
    d.mkdir()
    _write_png(d / "b.png", 16, 16, 0)
    _write_png(d / "a.png", 16, 16, 1)
    (d / "notes.txt").write_text("not an image")
    got = collect_images([str(d)])
    assert [os.path.basename(p) for p in got] == ["a.png", "b.png"]
    # explicit file + dir mix; missing path raises
    assert collect_images([str(d / "a.png")]) == [str(d / "a.png")]
    with pytest.raises(FileNotFoundError):
        collect_images([str(d / "missing.png")])

    assert cityscapes.PALETTE.shape == (len(cityscapes.CLASS_NAMES), 3)
    assert cityscapes.PALETTE.dtype == np.uint8
    assert np.asarray(camvid.PALETTE).shape == (len(camvid.CLASS_NAMES), 3)
    pal = auto_palette(4)
    assert pal.shape == (4, 3) and pal.dtype == np.uint8
    assert np.array_equal(pal, auto_palette(4))          # deterministic
    assert len({tuple(c) for c in pal}) == 4             # distinct colors


@pytest.mark.slow
def test_predict_cli_writes_masks(tmp_path):
    """Two resolutions -> two compiled groups; a tail chunk exercises the
    static-shape padding path; --color masks contain only palette colors.
    (~1 min idle CPU: two ENet eval compiles.)"""
    import cv2

    from torch_semantic_segmentation_tpu.cli.predict import main

    d = tmp_path / "frames"
    d.mkdir()
    for i in range(3):                       # batch 2 + padded tail of 1
        _write_png(d / f"s{i}.png", 64, 64, i)
    _write_png(d / "wide.png", 64, 96, 9)    # second shape group
    out = tmp_path / "out"

    written = main(["--model", "enet", "--dataset", "shapes",
                    "--input", str(d), "--output-dir", str(out),
                    "--batch-size", "2", "--color"])
    assert len(written) == 8                 # 4 ids + 4 color

    ids = cv2.imread(str(out / "s0_ids.png"), cv2.IMREAD_GRAYSCALE)
    assert ids is not None and ids.shape == (64, 64) and ids.dtype == np.uint8
    assert ids.max() < 4                     # shapes: 4 classes
    wide = cv2.imread(str(out / "wide_ids.png"), cv2.IMREAD_GRAYSCALE)
    assert wide.shape == (64, 96)

    from torch_semantic_segmentation_tpu.cli.predict import auto_palette
    pal = {tuple(c) for c in auto_palette(4)}
    color = cv2.cvtColor(cv2.imread(str(out / "s0_color.png")),
                         cv2.COLOR_BGR2RGB)
    got = {tuple(c) for c in color.reshape(-1, 3)}
    assert got <= pal


@pytest.mark.slow
def test_predict_cli_orbax_checkpoint_matches_serving(tmp_path):
    """--checkpoint restores the trained weights: CLI output ids equal a
    direct serving.make_predict_fn run on the independently restored model.
    (~2 min idle CPU: short train + two eval compiles.)"""
    import cv2
    import jax
    from flax import nnx

    from torch_semantic_segmentation_tpu.checkpoint import CheckpointManager
    from torch_semantic_segmentation_tpu.cli.predict import main
    from torch_semantic_segmentation_tpu.cli.train import main as train_main
    from torch_semantic_segmentation_tpu.models import get_model
    from torch_semantic_segmentation_tpu.serving import make_predict_fn
    from torch_semantic_segmentation_tpu.train import split_train_eval

    ckpt = str(tmp_path / "ck")
    train_main(["--dataset", "shapes", "--model", "enet",
                "--batch-size", "8", "--crop-size", "32",
                "--max-iterations", "2", "--log-every", "1",
                "--checkpoint-dir", ckpt, "--checkpoint-every", "1"])

    d = tmp_path / "frames"
    d.mkdir()
    _write_png(d / "f.png", 64, 64, 5)
    out = tmp_path / "out"
    main(["--model", "enet", "--dataset", "shapes", "--checkpoint", ckpt,
          "--input", str(d), "--output-dir", str(out), "--batch-size", "1"])
    cli_ids = cv2.imread(str(out / "f_ids.png"), cv2.IMREAD_GRAYSCALE)

    model = get_model("enet", num_classes=4, rngs=nnx.Rngs(0))
    _, _, params, rest = split_train_eval(model)
    params, rest, _ = CheckpointManager(ckpt).restore_params_rest(params, rest)
    nnx.update(model, params, rest)
    predict = make_predict_fn(model)
    frame = cv2.cvtColor(cv2.imread(str(d / "f.png")), cv2.COLOR_BGR2RGB)
    direct = np.asarray(jax.device_get(predict(frame[None])))[0]
    assert np.array_equal(cli_ids, direct)
