"""Inference CLI: segment image files with a trained model via the serving
path (SURVEY.md §0 "loadable pretrained weights" — the user-facing way to
run a checkpoint on their own frames; reference analog: the repo's scripts
consume checkpoints for eval only, uncitable, mount empty).

  python -m torch_semantic_segmentation_tpu.cli.predict \
      --model fastscnn --checkpoint ckpts --dataset cityscapes \
      --input frames/ --output-dir out --color

Writes `<stem>_ids.png` (class-id mask, uint8) per input image and, with
`--color`, `<stem>_color.png` colorized with the dataset palette.

TPU-shaped execution: inputs are grouped by resolution and each group runs
through ONE jit-compiled program (static shapes — distinct resolutions
compile once each, partial tail batches are padded to the compiled batch
size instead of recompiling). The predictor is `serving.make_predict_fn`:
uint8 NHWC in, ids out; normalize fused on device, BatchNorm folded into
conv kernels, low-res logits upsampled fused with the argmax in lane-major
layout — full-res logits never materialize (ops.resize_argmax).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="fastscnn")
    p.add_argument("--dataset", default="cityscapes",
                   choices=["cityscapes", "camvid", "bdd", "mapillary",
                            "synthetic", "shapes"],
                   help="declares num_classes, normalization, and palette")
    p.add_argument("--checkpoint", default=None,
                   help="orbax dir or torch .pth (optional: random init)")
    p.add_argument("--input", nargs="+", required=True,
                   help="image files and/or directories")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--color", action="store_true",
                   help="also write palette-colorized masks")
    p.add_argument("--no-fold-bn", dest="fold_bn", action="store_false",
                   help="keep BatchNorm unfolded (debug)")
    return p.parse_args(argv)


def collect_images(inputs: list[str]) -> list[str]:
    """Expand files/directories into a sorted list of image paths."""
    paths: list[str] = []
    for item in inputs:
        if os.path.isdir(item):
            for name in sorted(os.listdir(item)):
                if name.lower().endswith(_IMG_EXTS):
                    paths.append(os.path.join(item, name))
        elif os.path.isfile(item):
            paths.append(item)
        else:
            raise FileNotFoundError(item)
    if not paths:
        raise FileNotFoundError(f"no images found under {inputs}")
    return paths


def auto_palette(num_classes: int) -> np.ndarray:
    """Deterministic fallback palette for datasets without official colors:
    evenly spaced hues at full saturation (class 0 kept dark)."""
    import colorsys
    out = np.zeros((num_classes, 3), np.uint8)
    for c in range(1, num_classes):
        r, g, b = colorsys.hsv_to_rgb((c - 1) / max(num_classes - 1, 1),
                                      0.85, 0.95)
        out[c] = (int(r * 255), int(g * 255), int(b * 255))
    return out


def main(argv=None):
    import cv2
    import jax
    from flax import nnx

    from torch_semantic_segmentation_tpu.cli.common import build_dataset
    from torch_semantic_segmentation_tpu.models import get_model
    from torch_semantic_segmentation_tpu.serving import make_predict_fn

    args = parse_args(argv)
    bundle = build_dataset(args.dataset, None, "val") \
        if args.dataset in ("synthetic", "shapes") \
        else _bundle_meta_only(args.dataset)
    model = get_model(args.model, num_classes=bundle.num_classes,
                      rngs=nnx.Rngs(0))

    if args.checkpoint and args.checkpoint.endswith((".pth", ".pt")):
        from torch_semantic_segmentation_tpu.compat.torch_loader import (
            load_torch_checkpoint)
        load_torch_checkpoint(model, args.checkpoint)
        print(f"imported torch checkpoint {args.checkpoint}")
    elif args.checkpoint:
        from torch_semantic_segmentation_tpu.checkpoint import (
            CheckpointManager)
        from torch_semantic_segmentation_tpu.train import split_train_eval
        _, _, params, rest = split_train_eval(model)
        restored = CheckpointManager(args.checkpoint).restore_params_rest(
            params, rest)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint found in {args.checkpoint}")
        params, rest, step = restored
        nnx.update(model, params, rest)
        print(f"restored step-{step} checkpoint from {args.checkpoint}")

    predict = make_predict_fn(model, fold_bn=args.fold_bn,
                              mean=bundle.mean, std=bundle.std, output="ids")
    palette = bundle.palette if bundle.palette is not None \
        else auto_palette(bundle.num_classes)

    paths = collect_images(args.input)
    os.makedirs(args.output_dir, exist_ok=True)

    # one compiled program per distinct resolution; frames grouped by shape
    groups: dict[tuple[int, int], list[int]] = {}
    frames: list[np.ndarray] = []
    for i, path in enumerate(paths):
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError(f"could not decode {path}")
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        frames.append(img)
        groups.setdefault(img.shape[:2], []).append(i)

    written = []
    for (h, w), idxs in sorted(groups.items()):
        for lo in range(0, len(idxs), args.batch_size):
            chunk = idxs[lo:lo + args.batch_size]
            batch = np.stack([frames[i] for i in chunk], axis=0)
            if len(chunk) < args.batch_size:
                # pad the tail by repeating the last frame: keeps the batch
                # shape static so the group's single compile is reused
                pad = args.batch_size - len(chunk)
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], pad, axis=0)], axis=0)
            ids = np.asarray(jax.device_get(predict(batch)))[:len(chunk)]
            for j, i in enumerate(chunk):
                stem = os.path.splitext(os.path.basename(paths[i]))[0]
                id_path = os.path.join(args.output_dir, f"{stem}_ids.png")
                cv2.imwrite(id_path, ids[j])
                written.append(id_path)
                if args.color:
                    rgb = palette[ids[j]]
                    color_path = os.path.join(args.output_dir,
                                              f"{stem}_color.png")
                    cv2.imwrite(color_path,
                                cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
                    written.append(color_path)
        print(f"{len(idxs)} frame(s) at {h}x{w} -> {args.output_dir}")
    return written


def _bundle_meta_only(name: str):
    """Dataset metadata (classes/palette/normalization) without requiring
    --dataset-dir: prediction needs no ground-truth files on disk."""
    from torch_semantic_segmentation_tpu.cli.common import DatasetBundle
    from torch_semantic_segmentation_tpu.data import camvid, cityscapes
    from torch_semantic_segmentation_tpu.data.transforms import (
        CITYSCAPES_MEAN, CITYSCAPES_STD)

    if name in ("cityscapes", "bdd"):
        return DatasetBundle(
            dataset=None, num_classes=cityscapes.NUM_CLASSES,
            ignore_index=cityscapes.IGNORE_INDEX,
            class_names=cityscapes.CLASS_NAMES, label_lut=None,
            class_weights=None, mean=CITYSCAPES_MEAN, std=CITYSCAPES_STD,
            palette=cityscapes.PALETTE)
    if name == "camvid":
        return DatasetBundle(
            dataset=None, num_classes=camvid.NUM_CLASSES,
            ignore_index=camvid.IGNORE_INDEX,
            class_names=camvid.CLASS_NAMES, label_lut=None,
            class_weights=None, mean=CITYSCAPES_MEAN, std=CITYSCAPES_STD,
            palette=np.asarray(camvid.PALETTE, np.uint8))
    if name == "mapillary":
        # v1.2 release has 66 classes; colors live in the dataset config
        # json, which we don't require here — auto palette instead
        return DatasetBundle(
            dataset=None, num_classes=66, ignore_index=65, class_names=(),
            label_lut=None, class_weights=None,
            mean=CITYSCAPES_MEAN, std=CITYSCAPES_STD, palette=None)
    raise ValueError(name)


def cli() -> int:
    """Console-script entry point (pyproject [project.scripts]): discard
    main()'s programmatic return value so setuptools' sys.exit() sees 0."""
    main()
    return 0


if __name__ == "__main__":
    main()
