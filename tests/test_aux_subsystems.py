"""Aux subsystems (SURVEY.md §5): profiling harness, numeric sanitisation,
config files, and the stretch dataset loaders (BDD / Mapillary layouts
built synthetically on disk)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_cost_analysis_and_hlo():
    from torch_semantic_segmentation_tpu.profiling import (
        cost_analysis, dump_hlo)

    def f(a, b):
        return jnp.dot(a, b)

    a = jnp.zeros((128, 128))
    ca = cost_analysis(f, a, a)
    assert ca["flops"] >= 2 * 128**3 * 0.9
    hlo = dump_hlo(f, a, a)
    assert "fusion" in hlo or "dot" in hlo


def test_walltime_measure():
    from torch_semantic_segmentation_tpu.profiling import measure

    def step(x):
        return x * 1.0001

    sps, final = measure(jax.jit(step), jnp.ones((8, 8)), steps=3)
    assert sps > 0 and np.isfinite(sps)


def test_checked_step_raises_on_nan():
    from torch_semantic_segmentation_tpu.debug import checked_step

    def bad_step(state, x):
        return state, {"loss": jnp.log(x)}     # log(0) = -inf

    wrapped = checked_step(bad_step)
    state, m = wrapped(jnp.zeros(()), jnp.ones(()))
    assert np.isfinite(float(m["loss"]))
    with pytest.raises(Exception, match="non-finite"):
        wrapped(jnp.zeros(()), jnp.zeros(()))


def test_contract_configs_load_into_cli():
    from torch_semantic_segmentation_tpu.cli.train import parse_args
    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    names = sorted(os.listdir(cfg_dir))
    assert len(names) == 5                      # one per BASELINE config
    for n in names:
        args = parse_args(["--config", os.path.join(cfg_dir, n),
                           "--max-iterations", "1"])
        assert args.max_iterations == 1         # explicit flag wins
        assert args.model                       # config populated the rest
        assert args.batch_size > 0


def _png(path, arr):
    import cv2
    cv2.imwrite(path, arr)


def test_bdd_dataset_layout(tmp_path):
    from torch_semantic_segmentation_tpu.data.bdd import BDDDataset
    img_dir = tmp_path / "images" / "10k" / "train"
    lbl_dir = tmp_path / "labels" / "sem_seg" / "masks" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    import cv2
    for name in ("a", "b"):
        cv2.imwrite(str(img_dir / f"{name}.jpg"),
                    np.random.randint(0, 255, (16, 24, 3), np.uint8))
        _png(str(lbl_dir / f"{name}.png"),
             np.random.randint(0, 19, (16, 24), np.uint8))
    ds = BDDDataset(str(tmp_path), "train")
    assert len(ds) == 2
    img, lbl = ds[0]
    assert img.shape == (16, 24, 3) and lbl.shape == (16, 24)


def test_mapillary_dataset_layout(tmp_path):
    from torch_semantic_segmentation_tpu.data.mapillary import MapillaryDataset
    labels = ([{"readable": f"class {i}", "evaluate": True} for i in range(4)]
              + [{"readable": "void", "evaluate": False}])
    (tmp_path / "config.json").write_text(json.dumps({"labels": labels}))
    img_dir = tmp_path / "training" / "images"
    lbl_dir = tmp_path / "training" / "labels"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    import cv2
    cv2.imwrite(str(img_dir / "x.jpg"),
                np.random.randint(0, 255, (16, 24, 3), np.uint8))
    _png(str(lbl_dir / "x.png"), np.random.randint(0, 5, (16, 24), np.uint8))
    ds = MapillaryDataset(str(tmp_path), "train")
    assert ds.num_classes == 4
    lut = ds.label_lookup_table()
    assert lut[4] == 255 and lut[2] == 2       # void -> ignore, eval id kept
    img, lbl = ds[0]
    assert img.shape == (16, 24, 3)


def test_mapillary_palette_png_roundtrip(tmp_path):
    """Regression (ADVICE r1 high): Vistas masks are palette-indexed PNGs —
    the palette INDEX is the label id. Reading them through a
    grayscale-decode path collapses palette colors to luma and corrupts the
    ids; the loader must return the raw indices."""
    from PIL import Image
    from torch_semantic_segmentation_tpu.data.mapillary import MapillaryDataset

    labels = [{"readable": f"class {i}", "evaluate": True} for i in range(8)]
    (tmp_path / "config.json").write_text(json.dumps({"labels": labels}))
    img_dir = tmp_path / "training" / "images"
    lbl_dir = tmp_path / "training" / "labels"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    import cv2
    cv2.imwrite(str(img_dir / "x.jpg"),
                np.random.randint(0, 255, (16, 24, 3), np.uint8))
    ids = np.random.default_rng(0).integers(0, 8, (16, 24)).astype(np.uint8)
    pal_img = Image.fromarray(ids, mode="P")
    # palette whose colors do NOT equal their index (the corrupting case)
    palette = []
    for i in range(256):
        palette += [(i * 37) % 256, (i * 91 + 50) % 256, (i * 13 + 200) % 256]
    pal_img.putpalette(palette)
    pal_img.save(str(lbl_dir / "x.png"))

    ds = MapillaryDataset(str(tmp_path), "train")
    _, lbl = ds[0]
    np.testing.assert_array_equal(lbl, ids)
