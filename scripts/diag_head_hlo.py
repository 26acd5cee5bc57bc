"""HLO big-op audit of the FFM+classifier and loss-tail stages at full
bench scale. Usage: python scripts/diag_head_hlo.py [batch] [stage]
stage: head | loss
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
STAGE = sys.argv[2] if len(sys.argv) > 2 else "head"
H, W = 1024, 2048

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


def audit(fb, *args):
    c = jax.jit(fb).lower(*args).compile()
    print("bytes accessed:",
          round(c.cost_analysis().get("bytes accessed", 0) / 1e9, 2), "GB")
    txt = c.as_text()
    rows = []
    for line in txt.splitlines():
        m = re.search(r"%?([\w.-]+)\s*=\s*(\w+\[[^\]]*\][^ ]*)\s+(\w+)",
                      line)
        if not m:
            continue
        name, shape, op = m.groups()
        b = nbytes(shape)
        # only ops that materialize: fusion roots, copies, convs, params
        if b >= 100e6 and op in ("fusion", "copy", "convolution", "dot",
                                 "parameter", "transpose", "reduce",
                                 "custom-call", "select-and-scatter"):
            rows.append((b, op, shape.split("{")[0],
                         shape[shape.find("{"):shape.find("}") + 1]
                         if "{" in shape else "", line.strip()[:130]))
    rows.sort(reverse=True)
    print(f"materializing ops >= 100 MB: {len(rows)}, "
          f"{sum(r[0] for r in rows)/1e9:.1f} GB")
    for b, op, shape, layout, line in rows[:30]:
        print(f"{b/1e9:6.2f} GB {op:12s} {shape:26s} {layout}")


m = None
if STAGE == "head":
    from torch_semantic_segmentation_tpu.models.fastscnn import fastscnn
    m = fastscnn(19, dtype=jnp.bfloat16, upsample_logits=False,
                 rngs=nnx.Rngs(0))
    m.eval()
    gd, params, rest = nnx.split(m, nnx.Param, ...)
    hi = jnp.zeros((B, H // 8, W // 8, 64), jnp.bfloat16)
    lo = jnp.zeros((B, H // 32, W // 32, 128), jnp.bfloat16)

    def head_loss(p, h, l):
        mm = nnx.merge(gd, p, rest)
        return jnp.sum(mm.classifier(mm.ffm(h, l)).astype(jnp.float32) ** 2)

    audit(lambda p, h, l: jax.value_and_grad(head_loss)(p, h, l),
          params, hi, lo)
else:
    from torch_semantic_segmentation_tpu.losses import (
        resize_cross_entropy_loss)
    logits = jnp.zeros((B, H // 8, W // 8, 19), jnp.bfloat16)
    lbl = jnp.zeros((B, H, W), jnp.int32)
    audit(lambda lg: jax.value_and_grad(
        lambda g: resize_cross_entropy_loss(g, lbl))(lg), logits)
