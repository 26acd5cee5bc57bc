"""Inference benchmark: serving-path fps for the real-time zoo at
Cityscapes full resolution (the papers' headline numbers are fps at
1024×2048/768×1536 on desktop GPUs — e.g. FastSCNN 123.5 fps, ICNet 30 fps,
BiSeNet 65.5 fps).

Runs `serving.make_predict_fn` (folded BN, bf16, fused uint8 normalise,
argmax ids out) with honest fetch-synced timing.

    python scripts/bench_infer.py [model ...]
"""
import sys; sys.path.insert(0, "/root/repo")
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from torch_semantic_segmentation_tpu.models import get_model
from torch_semantic_segmentation_tpu.serving import make_predict_fn

MODELS = sys.argv[1:] or ["fastscnn", "enet", "bisenet", "icnet",
                          "contextnet", "lednet", "erfnet", "esnet"]
H, W, BATCH, STEPS = 1024, 2048, 8, 20

rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(0, 256, (BATCH, H, W, 3), dtype=np.uint8))

results = {}
for name in MODELS:
    try:
        # prefer low-res logits (serving fuses the upsample into the
        # lane-major resize_argmax) and no aux heads, where supported
        model = None
        for kwargs in ({"aux": False, "upsample_logits": False},
                       {"upsample_logits": False}, {"aux": False}, {}):
            try:
                model = get_model(name, num_classes=19, dtype=jnp.bfloat16,
                                  rngs=nnx.Rngs(0), **kwargs)
                break
            except TypeError:
                continue
        predict = make_predict_fn(model, output="ids")
        out = predict(frames)
        _ = int(out[0, 0, 0])                  # sync: compile + first run
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = predict(frames)
        _ = int(out[0, 0, 0])                  # drain
        dt = time.perf_counter() - t0
        results[name] = round(BATCH * STEPS / dt, 1)
        print(f"{name:>12s}: {results[name]:8.1f} fps @ {H}x{W}", flush=True)
    except Exception as e:
        print(f"{name:>12s}: failed ({type(e).__name__}: {str(e)[:80]})",
              flush=True)

print(json.dumps({"metric": f"inference_fps_{H}x{W}", "value": results}))
