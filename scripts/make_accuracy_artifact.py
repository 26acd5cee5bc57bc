"""On-chip accuracy artifact (VERDICT r2 next #10): train FastSCNN on the
learnable ShapesDataset ON THE REAL TPU via the actual train CLI
(--eval-every best-checkpoint path) and write ACCURACY_r<N>.json with the
eval curve so the accuracy half of the contract has a driver-checkable
artifact like BENCH does.

Usage: python scripts/make_accuracy_artifact.py [round] [steps]
"""

import json
import os
import re
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RND = int(sys.argv[1]) if len(sys.argv) > 1 else 3
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 400

# At crop 128 / batch 8 the GFE blocks sit far below the MBConv kernel's
# default spatial routing floor (TPU_SEG_PALLAS_MBCONV_MIN_PX = 2^17
# N·H·W, ops/blocks.py) — lift it so this artifact genuinely trains
# through the kernel it claims to cover (the perf floor is a throughput
# gate, not a correctness one; tests do the same).
os.environ.setdefault("TPU_SEG_PALLAS_MBCONV_MIN_PX", "0")


class Tee:
    def __init__(self, stream):
        self.stream = stream
        self.lines = []

    def write(self, s):
        self.stream.write(s)
        self.lines.append(s)

    def flush(self):
        self.stream.flush()


def _train_run(model="fastscnn", extra=()):
    """One CLI training run; returns the parsed eval curve."""
    from torch_semantic_segmentation_tpu.cli.train import main as train

    tee = Tee(sys.stdout)
    old = sys.stdout
    sys.stdout = tee
    ckpt = tempfile.mkdtemp(prefix="acc_artifact_")
    try:
        train(["--dataset", "shapes", "--model", model,
               "--batch-size", "8", "--crop-size", "128",
               "--scale-range", "0.75", "1.25", "--lr", "0.05",
               "--max-iterations", str(STEPS),
               "--eval-every", "100", "--eval-batches", "4",
               "--log-every", "100", "--checkpoint-dir", ckpt,
               "--checkpoint-every", str(STEPS), *extra])
    finally:
        sys.stdout = old
    out = "".join(tee.lines)
    return [{"step": int(m.group(1)), "val_miou": float(m.group(2))}
            for m in re.finditer(r"it (\d+) val mIoU ([\d.]+)", out)]


def main():
    base_cmd = ("python -m torch_semantic_segmentation_tpu.cli.train "
                "--dataset shapes --model fastscnn --batch-size 8 "
                "--crop-size 128 --scale-range 0.75 1.25 --lr 0.05 "
                f"--max-iterations {STEPS} --eval-every 100 "
                "--eval-batches 4")
    # run 1: the default path (in-model ×8 upsample, plain CE)
    # run 2: --fused-resize-loss — upsample_logits=False + resize-CE,
    # which on single-device TPU at crop 128 routes the fused Pallas
    # resize+CE kernel (ops/pallas_resize_ce.py): proves the kernel
    # trains a model to accuracy, not merely matches the XLA loss
    # VERDICT r3 next #2: the artifact must cover what HEAD actually
    # runs by default on TPU — FastSCNN (packed LDS + packed resize
    # head + folded BN + mbconv), the fused Pallas resize-CE path, a
    # whole-network packed BODY (ENet), and an OHEM run; enet+ohem also
    # exercises the packed per-pixel OHEM map (losses.ohem_cross_entropy
    # on PackedLogits) end to end on chip.
    # VERDICT r4 next #3 (round 5): every default-ON packed family gets
    # an on-chip convergence run — esnet + erfnet whole-network packed
    # bodies (erfnet default-ON since the round-5 structured-build A/B)
    # and the unet full-res W-packed rim (deconv variant is the default).
    runs = []
    for name, model, extra in (
            ("default", "fastscnn", ()),
            ("fused_resize_pallas_ce", "fastscnn", ("--fused-resize-loss",)),
            ("enet_packed_body", "enet", ()),
            ("enet_ohem_packed_map", "enet", ("--loss", "ohem")),
            ("esnet_packed_body", "esnet", ()),
            ("erfnet_packed_body", "erfnet", ()),
            ("lednet_packed_body", "lednet", ()),
            ("unet_packed_rim", "unet", ())):
        curve = _train_run(model, extra)
        best = max((p["val_miou"] for p in curve), default=None)
        runs.append({
            "run": name,
            "model": model,
            "flags": list(extra),
            "eval_curve": curve,
            "best_val_miou": best,
            "passed": bool(best is not None and best > 70.0),
        })
        print(f"[{name}] best val mIoU {best}")
    best = runs[0]["best_val_miou"]
    artifact = {
        "model": "fastscnn",
        "dataset": "shapes (data/synthetic.py ShapesDataset, disjoint "
                   "train/val seeds)",
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "steps": STEPS,
        "crop": 128,
        "batch": 8,
        "packed_lds": (os.environ.get("FASTSCNN_PACKED_LDS")
                       or ("default:on" if jax.default_backend() == "tpu"
                           else "default:off")),
        "pallas_mbconv": (os.environ.get("TPU_SEG_PALLAS_MBCONV")
                          or ("default:on" if jax.default_backend() == "tpu"
                              else "default:off")),
        "pallas_mbconv_min_px": os.environ["TPU_SEG_PALLAS_MBCONV_MIN_PX"],
        "eval_curve": runs[0]["eval_curve"],
        "best_val_miou": best,
        "threshold": 70.0,
        "passed": all(r["passed"] for r in runs),
        "runs": runs,
        "command": base_cmd + "  [per-run model/flags in runs]",
    }
    path = f"/root/repo/ACCURACY_r{RND:02d}.json"
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {path}: " + "; ".join(
        f"{r['run']} best {r['best_val_miou']}" for r in runs))


if __name__ == "__main__":
    main()
