"""Dump the packed-LDS f+b optimized HLO and summarize the biggest
ops by output size (looking for relayout copies/transposes XLA inserts).
Usage: python scripts/diag_packed_hlo.py [batch]
"""

import os
import re
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from flax import nnx

B = int(sys.argv[1]) if len(sys.argv) > 1 else 40
H, W = 1024, 2048

from torch_semantic_segmentation_tpu.models.fastscnn import (
    LearningToDownsample)
from torch_semantic_segmentation_tpu.ops import packed_lds

lds = LearningToDownsample(3, (32, 48, 64), dtype=jnp.bfloat16,
                           rngs=nnx.Rngs(0))
lds.eval()
gd, state = nnx.split(lds)
x = jnp.zeros((B, H, W, 3), jnp.bfloat16)


def loss(state, x):
    m = nnx.merge(gd, state)
    return jnp.sum(packed_lds.lds_forward(m, x).astype(jnp.float32) ** 2)


fb = jax.jit(lambda s, x: jax.value_and_grad(loss)(s, x))
txt = fb.lower(state, x).compile().as_text()

DT = {"f32": 4, "bf16": 2, "u8": 1, "s32": 4, "u32": 4, "pred": 1, "f16": 2}


def nbytes(shape_str):
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = DT.get(dt, 4)
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n


rows = []
for line in txt.splitlines():
    m = re.search(r"%?([\w.-]+)\s*=\s*(\w+\[[^\]]*\][^ ]*)\s+(\w+)", line)
    if not m:
        continue
    name, shape, op = m.groups()
    b = nbytes(shape)
    if b >= 100e6:
        rows.append((b, op, name, shape.split("{")[0],
                     line.strip()[:180]))

rows.sort(reverse=True)
print(f"ops with output >= 100 MB ({len(rows)}):")
for b, op, name, shape, line in rows[:40]:
    print(f"{b/1e9:6.2f} GB  {op:18s} {shape:28s} {name[:40]}")

copies = [r for r in rows if r[1] in ("copy", "transpose", "bitcast-convert",
                                      "reshape")]
print(f"\nbig copies/transposes: {len(copies)}, "
      f"{sum(r[0] for r in copies)/1e9:.2f} GB total")
for b, op, name, shape, line in copies[:20]:
    print(f"{b/1e9:6.2f} GB  {op:10s} {line[:150]}")
