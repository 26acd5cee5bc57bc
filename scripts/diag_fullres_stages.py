"""Diagnostic: FastSCNN per-stage fwd+bwd cost at full-res bench scale
(b32, 1024x2048, bf16) with cost_analysis bytes — attributes the 142 GB
model-step traffic to stages (VERDICT r1 #9 roofline attribution)."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from torch_semantic_segmentation_tpu.models.fastscnn import fastscnn

B, H, W = (int(sys.argv[1]) if len(sys.argv) > 1 else 32), 1024, 2048
m = fastscnn(19, dtype=jnp.bfloat16, upsample_logits=False, rngs=nnx.Rngs(0))
gd, params, rest = nnx.split(m, nnx.Param, ...)
merge = lambda p: nnx.merge(gd, p, rest)


def _fetch(out):
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))


def report(name, f, *args, n=4):
    c = jax.jit(f).lower(*args).compile()
    by = c.cost_analysis().get("bytes accessed", 0.0)
    out = c(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = c(*args)
    _fetch(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:7.1f} ms  {by/1e9:6.1f} GB  {by/dt/1e9:4.0f} GB/s",
          flush=True)
    return out


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.bfloat16)

# forward stage outputs (train mode: BN batch stats)
def run_lds(p, r, x):
    mm = nnx.merge(gd, p, r); mm.train()
    out = mm.lds(x)
    return out

h1 = report("fwd lds        ", run_lds, params, rest, x)

def run_gfe(p, r, h):
    mm = nnx.merge(gd, p, r); mm.train()
    return mm.gfe(h)

lo = report("fwd gfe        ", run_gfe, params, rest, h1)

def run_ffm(p, r, a, b):
    mm = nnx.merge(gd, p, r); mm.train()
    return mm.ffm(a, b)

fu = report("fwd ffm        ", run_ffm, params, rest, h1, lo)

def run_cls(p, r, f):
    mm = nnx.merge(gd, p, r); mm.train()
    return mm.classifier(f)

report("fwd classifier ", run_cls, params, rest, fu)


def gradded(stage_fn):
    def f(p, r, *inp):
        mm = nnx.merge(gd, p, r); mm.train()

        def compute(mm):
            return jnp.sum(stage_fn(mm, *inp).astype(jnp.float32))

        _, grads = nnx.value_and_grad(compute)(mm)
        return grads
    return f


report("fwd+bwd lds    ", gradded(lambda mm, i: mm.lds(i)), params, rest, x)
report("fwd+bwd gfe    ", gradded(lambda mm, i: mm.gfe(i)), params, rest, h1)
report("fwd+bwd ffm    ", gradded(lambda mm, a, b: mm.ffm(a, b)),
       params, rest, h1, lo)
report("fwd+bwd cls    ", gradded(lambda mm, i: mm.classifier(i)),
       params, rest, fu)
