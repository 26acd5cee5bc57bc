"""Evaluation CLI: confusion-matrix mIoU over a validation split, single or
multi-scale(+flip) (SURVEY.md §2.6 "Evaluator"; BASELINE.json config 5).

  python -m torch_semantic_segmentation_tpu.cli.eval \
      --model bisenet --dataset cityscapes --dataset-dir /data/cityscapes \
      --checkpoint ckpts --multi-scale

--checkpoint accepts an orbax checkpoint dir (ours) or a torch .pth file
(reference weights via the compat loader).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="fastscnn")
    p.add_argument("--dataset", default="cityscapes",
                   choices=["cityscapes", "camvid", "bdd", "mapillary",
                            "synthetic", "shapes"])
    p.add_argument("--dataset-dir", default=None)
    p.add_argument("--split", default="val")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--checkpoint", default=None,
                   help="orbax dir or torch .pth (optional: random init)")
    p.add_argument("--multi-scale", action="store_true")
    p.add_argument("--scales", type=float, nargs="+",
                   default=[0.5, 0.75, 1.0, 1.25, 1.5, 1.75])
    p.add_argument("--no-flip", dest="flip", action="store_false")
    p.add_argument("--eval-size", type=int, nargs=2, default=None,
                   help="resize eval inputs to H W (defaults to native)")
    p.add_argument("--max-batches", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None):
    from torch_semantic_segmentation_tpu.cli.common import build_dataset
    from torch_semantic_segmentation_tpu.data.pipeline import (
        batch_iterator, prefetch_to_device)
    from torch_semantic_segmentation_tpu.data.transforms import normalize_batch
    from torch_semantic_segmentation_tpu.eval import (
        evaluate, make_multiscale_eval_step)
    from torch_semantic_segmentation_tpu.metrics import (
        iou_from_confusion_matrix, new_confusion_matrix)
    from torch_semantic_segmentation_tpu.models import get_model
    from torch_semantic_segmentation_tpu.train import (
        make_eval_step, split_train_eval)

    args = parse_args(argv)
    bundle = build_dataset(args.dataset, args.dataset_dir, args.split)
    model = get_model(args.model, num_classes=bundle.num_classes,
                      rngs=nnx.Rngs(0))

    if args.checkpoint and args.checkpoint.endswith((".pth", ".pt")):
        from torch_semantic_segmentation_tpu.compat.torch_loader import (
            load_torch_checkpoint)
        load_torch_checkpoint(model, args.checkpoint)
        print(f"imported torch checkpoint {args.checkpoint}")

    _, gd_eval, params, rest = split_train_eval(model)

    if args.checkpoint and not args.checkpoint.endswith((".pth", ".pt")):
        from torch_semantic_segmentation_tpu.checkpoint import CheckpointManager
        # optimizer-state agnostic: eval never reconstructs the training
        # run's optax chain (see CheckpointManager.restore_params_rest)
        mgr = CheckpointManager(args.checkpoint)
        restored = mgr.restore_params_rest(params, rest)
        if restored is None:
            raise FileNotFoundError(
                f"no checkpoint found in {args.checkpoint}")
        params, rest, step = restored
        print(f"restored step-{step} checkpoint from {args.checkpoint}")

    if args.multi_scale:
        ev = make_multiscale_eval_step(
            gd_eval, num_classes=bundle.num_classes,
            scales=tuple(args.scales), flip=args.flip,
            ignore_index=bundle.ignore_index)
    else:
        ev = make_eval_step(gd_eval, num_classes=bundle.num_classes,
                            ignore_index=bundle.ignore_index)

    def batches():
        host = batch_iterator(bundle.dataset, args.batch_size, shuffle=False,
                              drop_last=False, epochs=1,
                              label_lut=bundle.label_lut)
        for i, (imgs, lbls) in enumerate(prefetch_to_device(host, size=2)):
            if args.max_batches is not None and i >= args.max_batches:
                return
            imgs = normalize_batch(imgs, mean=bundle.mean, std=bundle.std)
            if args.eval_size is not None:
                from torch_semantic_segmentation_tpu.ops import resize_bilinear
                imgs = resize_bilinear(imgs, tuple(args.eval_size))
            yield imgs, jnp.asarray(lbls, jnp.int32)

    iou, miou, cm = evaluate(ev, params, rest, batches(),
                             num_classes=bundle.num_classes)
    for name, v in zip(bundle.class_names, iou):
        print(f"{name:>16s}  {100 * v:6.2f}")
    print(f"{'mIoU':>16s}  {100 * miou:6.2f}")
    return iou, miou


def cli() -> int:
    """Console-script entry point (pyproject [project.scripts]): discard
    main()'s programmatic return value so setuptools' sys.exit() sees 0."""
    main()
    return 0


if __name__ == "__main__":
    main()
