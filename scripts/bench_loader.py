"""Data-pipeline throughput benchmark: native C++ decode loader vs the
Python-thread loader on full-res Cityscapes-shaped JPEG/PNG pairs.

The train headline (bench.py, 277 img/s/chip) implies the input pipeline
must sustain ~1.7 GB/s of decoded pixels per chip; this measures whether
the host side keeps up (SURVEY.md §2.3 "Pillow-SIMD/libjpeg-turbo" tier).

    python scripts/bench_loader.py [n_images] [threads]
"""
import sys; sys.path.insert(0, "/root/repo")
import json
import os
import tempfile
import time

import cv2
import numpy as np

from torch_semantic_segmentation_tpu.data import native_loader

N = int(sys.argv[1]) if len(sys.argv) > 1 else 48
THREADS = int(sys.argv[2]) if len(sys.argv) > 2 else os.cpu_count() or 4
H, W, BATCH = 1024, 2048, 8

tmp = tempfile.mkdtemp(prefix="bench_loader_")
rng = np.random.default_rng(0)
imgs, lbls = [], []
base = rng.integers(0, 255, (H, W, 3), np.uint8)
lbl_base = rng.integers(0, 34, (H, W), np.uint8)
for i in range(N):
    ip = os.path.join(tmp, f"i{i}.jpg")
    lp = os.path.join(tmp, f"l{i}.png")
    cv2.imwrite(ip, cv2.cvtColor(np.roll(base, i, axis=1), cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 90])
    cv2.imwrite(lp, np.roll(lbl_base, i, axis=1))
    imgs.append(ip)
    lbls.append(lp)
print(f"{N} {H}x{W} jpeg+png pairs, {THREADS} threads", flush=True)

lut = np.arange(256, dtype=np.uint8)

if not native_loader.native_available():
    print("native loader unavailable")
    sys.exit(0)

loader = native_loader.NativeBatchLoader(
    imgs, lbls, BATCH, H, W, num_threads=THREADS, prefetch=3,
    label_lut=lut, shuffle=False, epochs=3)
it = iter(loader)
next(it)  # warm the decode pool
t0 = time.perf_counter()
n_imgs = 0
for _ in range((3 * N) // BATCH - 2):
    img, lab = next(it)
    n_imgs += img.shape[0]
dt = time.perf_counter() - t0
rate = n_imgs / dt
gbs = rate * (H * W * 3 + H * W) / 1e9
print(json.dumps({"metric": "native_loader_imgs_per_sec_1024x2048",
                  "value": round(rate, 1), "unit": "images/sec",
                  "decoded_GB_per_sec": round(gbs, 2),
                  "threads": THREADS}), flush=True)
loader.close()
for p in imgs + lbls:
    os.unlink(p)
os.rmdir(tmp)
