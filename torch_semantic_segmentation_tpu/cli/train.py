"""Training CLI (SURVEY.md §3.1 build-side): one jit-compiled step program
(fused on-device augmentation + fwd + bwd + SGD/poly-LR + GSPMD psum over
the data mesh), host loop only for logging/checkpoints.

Usage (flag names mirror the reference train scripts, SURVEY.md §2.6):

  python -m torch_semantic_segmentation_tpu.cli.train \
      --model fastscnn --dataset cityscapes --dataset-dir /data/cityscapes \
      --batch-size 16 --crop-size 768 --lr 0.045 --max-iterations 160000 \
      --loss ohem --checkpoint-dir ckpts

Smoke run (CPU, no data): --dataset synthetic --max-iterations 5
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None,
                   help="JSON config file (configs/*.json, one per contract "
                        "config); explicit flags override its values")
    p.add_argument("--model", default="fastscnn")
    p.add_argument("--dataset", default="cityscapes",
                   choices=["cityscapes", "camvid", "bdd", "mapillary",
                            "synthetic", "shapes"])
    p.add_argument("--dataset-dir", default=None)
    p.add_argument("--batch-size", type=int, default=16,
                   help="global batch (split across the data mesh axis)")
    p.add_argument("--crop-size", type=int, nargs="+", default=[768],
                   help="train crop (one value = square)")
    p.add_argument("--scale-range", type=float, nargs=2, default=[0.5, 2.0])
    p.add_argument("--lr", type=float, default=0.045)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--poly-power", type=float, default=0.9)
    p.add_argument("--max-iterations", type=int, default=1000)
    p.add_argument("--schedule-steps", type=int, default=None,
                   help="poly-LR decay horizon (defaults to "
                        "--max-iterations). Set it to the TOTAL planned "
                        "steps when a run will stop early and --resume "
                        "later, so the schedule is continuous across the "
                        "restart")
    p.add_argument("--loss", default="ce", choices=["ce", "ohem"])
    p.add_argument("--aux-weight", type=float, default=0.4)
    p.add_argument("--class-weights", action="store_true",
                   help="use ENet-style 1/ln(c+p) class weights")
    p.add_argument("--ohem-min-kept", type=int, default=100_000)
    p.add_argument("--fused-resize-loss", action="store_true",
                   help="build the model with upsample_logits=False and "
                        "fuse the final upsample into the loss "
                        "(lane-major layout; works with --loss ce and ohem, "
                        "and with aux-head models at mixed head resolutions)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialise the forward in the backward "
                        "(jax.checkpoint); wins at full-res where HBM binds")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=1000)
    p.add_argument("--eval-every", type=int, default=0,
                   help="run val-split mIoU evaluation every N steps "
                        "(0 = off); tracks the best mIoU and keeps that "
                        "checkpoint in <checkpoint-dir>/best")
    p.add_argument("--eval-batches", type=int, default=None,
                   help="cap the number of val batches per in-training eval")
    p.add_argument("--eval-multi-scale", action="store_true",
                   help="use multi-scale(+flip) inference for the "
                        "in-training --eval-every validation / best-ckpt "
                        "selection (BASELINE config 5 pairs multi-scale "
                        "eval with the aux-head models)")
    p.add_argument("--eval-scales", type=float, nargs="+",
                   default=[0.75, 1.0, 1.25],
                   help="scale set for --eval-multi-scale (in-training "
                        "default is narrower than the eval CLI's six-scale "
                        "set to bound validation cost)")
    p.add_argument("--resume", action="store_true",
                   help="resume from latest checkpoint in --checkpoint-dir")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--logdir", default=None,
                   help="TensorBoard scalar dir (clu metric_writers): loss, "
                        "lr, images/sec/chip (SURVEY.md §5 observability)")
    p.add_argument("--native-loader", action="store_true",
                   help="use the C++ decode/prefetch loader (native/) "
                        "instead of Python threads")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pretrained", default=None,
                   help="torch .pth checkpoint to import before training")
    p.add_argument("--multihost", action="store_true",
                   help="join a multi-process jax cluster "
                        "(jax.distributed.initialize; coordinator from "
                        "JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / "
                        "JAX_PROCESS_ID or TPU pod metadata). Each process "
                        "decodes only its slice of every global batch "
                        "(parallel.distributed)")
    args = p.parse_args(argv)
    if args.config:
        import json
        with open(args.config) as f:
            cfg = json.load(f)
        import sys
        given = argv if argv is not None else sys.argv[1:]
        explicit = {a.split("=")[0].lstrip("-").replace("-", "_")
                    for a in given if a.startswith("--")}
        for k, v in cfg.items():
            if k not in explicit:
                setattr(args, k, v)
    return args


def main(argv=None):
    args = parse_args(argv)

    # Preemption-safe save hook (SURVEY.md §5 "failure detection"): TPU
    # maintenance events / cluster preemptions deliver SIGTERM. Install the
    # handler before the (slow) build+compile phase so an early signal is
    # not fatal; the train loop checks the flag each step, forces a
    # checkpoint, and exits cleanly so --resume continues from there.
    # Only possible from the main thread (CPython restriction) — embedded
    # callers on worker threads just don't get the hook.
    import signal
    import threading

    preempted = {"flag": False}

    def _on_term(signum, frame):
        preempted["flag"] = True

    prev_handler = None
    if threading.current_thread() is threading.main_thread():
        prev_handler = signal.signal(signal.SIGTERM, _on_term)
    try:
        return _run(args, preempted)
    finally:
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)


def _run(args, preempted):
    from torch_semantic_segmentation_tpu.cli.common import (
        build_dataset, build_loss)
    from torch_semantic_segmentation_tpu.data.pipeline import (
        batch_iterator, prefetch_to_device)
    from torch_semantic_segmentation_tpu.data.transforms import (
        AugmentConfig, augment_batch)
    from torch_semantic_segmentation_tpu.models import get_model
    from torch_semantic_segmentation_tpu.parallel.mesh import (
        batch_sharding, data_parallel_mesh, replicate)
    from torch_semantic_segmentation_tpu.train import (
        OptimizerConfig, create_train_state, make_train_step)

    dist = None
    if args.multihost:
        from torch_semantic_segmentation_tpu.parallel import (
            distributed as dist)
        dist.initialize()
        print(f"multihost: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")

    crop = (args.crop_size[0], args.crop_size[-1])
    bundle = build_dataset(args.dataset, args.dataset_dir, "train",
                           synthetic_size=(max(args.batch_size * 2, 8),
                                           crop[0], crop[1]))

    mesh = data_parallel_mesh()
    n_dev = mesh.devices.size
    if args.batch_size % n_dev:
        raise ValueError(f"--batch-size {args.batch_size} not divisible by "
                         f"{n_dev} devices")
    print(f"devices={n_dev} global_batch={args.batch_size} "
          f"model={args.model} dataset={args.dataset}")

    model_kwargs = {}
    if args.fused_resize_loss:
        model_kwargs["upsample_logits"] = False
    model = get_model(args.model, num_classes=bundle.num_classes,
                      dtype=jnp.bfloat16 if args.bf16 else None,
                      rngs=nnx.Rngs(args.seed), **model_kwargs)
    if args.pretrained:
        from torch_semantic_segmentation_tpu.compat.torch_loader import (
            load_torch_checkpoint)
        load_torch_checkpoint(model, args.pretrained)
        print(f"imported torch checkpoint {args.pretrained}")

    opt_cfg = OptimizerConfig(
        lr=args.lr, momentum=args.momentum, weight_decay=args.weight_decay,
        power=args.poly_power,
        max_steps=args.schedule_steps or args.max_iterations)
    tx = opt_cfg.make()
    gd_train, gd_eval, state = create_train_state(model, tx)
    state = replicate(state, mesh)

    loss_fn = build_loss(
        args.loss, ignore_index=bundle.ignore_index,
        aux_weight=args.aux_weight,
        class_weights=bundle.class_weights if args.class_weights else None,
        ohem_min_kept=args.ohem_min_kept,
        fused_resize=args.fused_resize_loss)
    inner = make_train_step(gd_train, tx, loss_fn, jit=False,
                            remat=args.remat)

    aug_cfg = AugmentConfig(
        crop=crop, scale_range=tuple(args.scale_range),
        mean=bundle.mean, std=bundle.std, ignore_index=bundle.ignore_index,
        out_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)

    def step_fn(state, raw_images, raw_labels, key):
        images, labels = augment_batch(raw_images, raw_labels, key, aug_cfg)
        return inner(state, images, labels)

    jstep = jax.jit(step_fn, donate_argnums=(0,),
                    static_argnums=())

    mgr = None
    start_step = 0
    data_key = jax.random.key(args.seed + 1)
    if dist is not None and dist.is_multiprocess():
        # the aug PRNG key must be a global (replicated) array so the jit
        # step sees consistent shardings across hosts
        data_key = jax.random.wrap_key_data(
            replicate(jax.random.key_data(data_key), mesh))
    if args.checkpoint_dir:
        from torch_semantic_segmentation_tpu.checkpoint import CheckpointManager
        mgr = CheckpointManager(args.checkpoint_dir,
                                save_interval_steps=args.checkpoint_every)
        if args.resume:
            restored = mgr.restore_latest(state, data_key=data_key)
            if restored is not None:
                state, data_key, start_step = restored
                state = replicate(state, mesh)
                # restored key arrives committed to one device; re-replicate
                data_key = jax.random.wrap_key_data(
                    replicate(jax.random.key_data(data_key), mesh))
                print(f"resumed from step {start_step}")

    writer = None
    if args.logdir and jax.process_index() == 0:
        from clu import metric_writers
        writer = metric_writers.create_default_writer(args.logdir)

    sharding = batch_sharding(mesh)
    # one batch per step, so batch-sequence == step: on resume the loaders
    # fast-forward to start_step and the (seed, epoch)-keyed shuffle makes
    # the stream bit-identical to an uninterrupted run (the restored
    # data_key continues the augmentation randomness the same way)
    if dist is not None and dist.is_multiprocess():
        # each process decodes 1/num_hosts of every deterministic global
        # batch (via the C++ loader when --native-loader) and contributes
        # its shard of the global jax.Array
        dev = dist.local_batch_iterator(
            bundle.dataset, args.batch_size, mesh=mesh, seed=args.seed,
            label_lut=bundle.label_lut, start_batch=start_step,
            native=args.native_loader)
    elif args.native_loader:
        from torch_semantic_segmentation_tpu.data.native_loader import (
            native_batch_iterator)
        host = native_batch_iterator(bundle.dataset, args.batch_size,
                                     seed=args.seed,
                                     label_lut=bundle.label_lut,
                                     start_batch=start_step)
        dev = prefetch_to_device(host, size=2, sharding=sharding)
    else:
        host = batch_iterator(bundle.dataset, args.batch_size,
                              seed=args.seed, label_lut=bundle.label_lut,
                              start_batch=start_step)
        dev = prefetch_to_device(host, size=2, sharding=sharding)

    lr_schedule = optax.polynomial_schedule(
        init_value=opt_cfg.lr, end_value=0.0, power=opt_cfg.power,
        transition_steps=opt_cfg.max_steps)

    # In-training validation + best-checkpoint selection (SURVEY.md §2.6
    # "Evaluator": the reference evaluated per epoch via ignite with
    # best-mIoU ModelCheckpoint; here it's per --eval-every steps).
    best_miou = float("-inf")
    best_mgr = None
    run_validation = None
    if args.eval_every > 0:
        from torch_semantic_segmentation_tpu.data.transforms import (
            normalize_batch)
        from torch_semantic_segmentation_tpu.eval import evaluate
        from torch_semantic_segmentation_tpu.train import make_eval_step

        val_bundle = build_dataset(
            args.dataset, args.dataset_dir, "val",
            synthetic_size=(max(args.batch_size * 2, 8), crop[0], crop[1]))
        if args.eval_multi_scale:
            from torch_semantic_segmentation_tpu.eval import (
                make_multiscale_eval_step)
            ev = make_multiscale_eval_step(
                gd_eval, num_classes=val_bundle.num_classes,
                scales=tuple(args.eval_scales), flip=True,
                ignore_index=val_bundle.ignore_index)
        else:
            ev = make_eval_step(gd_eval, num_classes=val_bundle.num_classes,
                                ignore_index=val_bundle.ignore_index)
        if args.checkpoint_dir:
            import os
            from torch_semantic_segmentation_tpu.checkpoint import (
                CheckpointManager)
            best_mgr = CheckpointManager(
                os.path.join(args.checkpoint_dir, "best"),
                max_to_keep=1, save_interval_steps=1)

        def run_validation(state):
            def val_batches():
                if dist is not None and dist.is_multiprocess():
                    it = dist.local_batch_iterator(
                        val_bundle.dataset, args.batch_size, mesh=mesh,
                        shuffle=False, drop_last=True, epochs=1,
                        label_lut=val_bundle.label_lut)
                else:
                    host = batch_iterator(
                        val_bundle.dataset, args.batch_size, shuffle=False,
                        drop_last=True, epochs=1,
                        label_lut=val_bundle.label_lut)
                    it = prefetch_to_device(host, size=2)
                for i, (imgs, lbls) in enumerate(it):
                    if (args.eval_batches is not None
                            and i >= args.eval_batches):
                        return
                    imgs = normalize_batch(imgs, mean=val_bundle.mean,
                                           std=val_bundle.std)
                    yield imgs, jnp.asarray(lbls, jnp.int32)

            iou, miou, _ = evaluate(ev, state.params, state.rest,
                                    val_batches(),
                                    num_classes=val_bundle.num_classes)
            return np.asarray(iou, np.float64), float(miou)

    t0 = time.perf_counter()
    imgs_done = 0
    loss_val = float("nan")
    for it in range(start_step, args.max_iterations):
        raw_images, raw_labels = next(dev)
        data_key, sub = jax.random.split(data_key)
        state, metrics = jstep(state, raw_images, raw_labels, sub)
        imgs_done += args.batch_size
        if (it + 1) % args.log_every == 0 or it + 1 == args.max_iterations:
            loss_val = float(metrics["loss"])   # device sync point
            dt = time.perf_counter() - t0
            img_s = imgs_done / dt
            print(f"it {it + 1}/{args.max_iterations} "
                  f"loss {loss_val:.6f} "
                  f"img/s {img_s:.1f}")
            if writer is not None:
                writer.write_scalars(it + 1, {
                    "train/loss": loss_val,
                    "train/images_per_sec_per_chip": img_s / n_dev,
                    "train/lr": float(lr_schedule(it)),
                })
            t0, imgs_done = time.perf_counter(), 0
        if run_validation is not None and (
                (it + 1) % args.eval_every == 0
                or it + 1 == args.max_iterations):
            iou, miou = run_validation(state)
            marker = ""
            if miou > best_miou:
                best_miou = miou
                marker = " (best)"
                if best_mgr is not None:
                    best_mgr.save(it + 1, state, data_key=data_key,
                                  force=True)
            # per-class observability (SURVEY.md §5 metrics row: "val mIoU
            # per-class + mean"): worst classes on the console, full table
            # as val/iou/<class> TensorBoard scalars
            names = val_bundle.class_names
            worst = np.argsort(iou)[:3]
            worst_str = " ".join(
                f"{names[c]}={100 * iou[c]:.1f}" for c in worst)
            print(f"it {it + 1} val mIoU {100 * miou:.2f}{marker} "
                  f"worst: {worst_str}")
            if writer is not None:
                writer.write_scalars(it + 1, {
                    "val/miou": miou,
                    **{f"val/iou/{names[c]}": float(iou[c])
                       for c in range(len(names))},
                })
        # capture the flag BEFORE the save so a signal landing mid-save is
        # handled next iteration rather than skipping the forced checkpoint
        stopping = preempted["flag"]
        if mgr is not None:
            mgr.save(it + 1, state, data_key=data_key,
                     force=(it + 1 == args.max_iterations or stopping))
        if stopping:
            if mgr is not None:
                print(f"SIGTERM: checkpoint saved at it {it + 1}, exiting "
                      "(restart with --resume)")
            else:
                print("SIGTERM: exiting (no --checkpoint-dir, nothing saved)")
            break
    if mgr is not None:
        mgr.wait()
        mgr.close()
    if best_mgr is not None:
        best_mgr.wait()
        best_mgr.close()
    if writer is not None:
        writer.flush()
    if best_miou > float("-inf"):
        print(f"done: final loss {loss_val:.4f} "
              f"best val mIoU {100 * best_miou:.2f}")
    else:
        print(f"done: final loss {loss_val:.4f}")
    return state


def cli() -> int:
    """Console-script entry point (pyproject [project.scripts]): discard
    main()'s programmatic return value so setuptools' sys.exit() sees 0."""
    main()
    return 0


if __name__ == "__main__":
    main()
