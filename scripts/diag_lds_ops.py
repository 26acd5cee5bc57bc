"""Diagnostic: op-level byte/time attribution inside FastSCNN's
LearningToDownsample at full-res (b32, 1024x2048, bf16) — conv vs BN vs
depthwise, fwd and fwd+bwd."""
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
    print(f"{name}: {dt*1e3:7.1f} ms  {by/1e9:6.2f} GB  {by/dt/1e9:4.0f} GB/s",
          flush=True)
    return out


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.bfloat16)


def stagef(fn):
    def f(p, r, *inp):
        mm = nnx.merge(gd, p, r); mm.train()
        return fn(mm, *inp)
    return f


def gradf(fn):
    def f(p, r, *inp):
        mm = nnx.merge(gd, p, r); mm.train()

        def compute(mm):
            return jnp.sum(fn(mm, *inp).astype(jnp.float32))

        _, grads = nnx.value_and_grad(compute)(mm)
        return grads
    return f


# conv1: 3->32 s2 @1024x2048
y1 = report("conv1 raw      ", stagef(lambda mm, i: mm.lds.conv.conv(i)),
            params, rest, x)
report("conv1+bn+relu  ", stagef(lambda mm, i: mm.lds.conv(i)),
       params, rest, x)
h1 = stagef(lambda mm, i: mm.lds.conv(i))(params, rest, x)

# ds1: depthwise 32 s2 + pw 32->48 @512x1024
report("ds1.dw raw     ", stagef(lambda mm, i: mm.lds.ds1.dw.conv(i)),
       params, rest, h1)
report("ds1.dw+bn+relu ", stagef(lambda mm, i: mm.lds.ds1.dw(i)),
       params, rest, h1)
h1d = stagef(lambda mm, i: mm.lds.ds1.dw(i))(params, rest, h1)
report("ds1.pw         ", stagef(lambda mm, i: mm.lds.ds1.pw(i)),
       params, rest, h1d)
h2 = stagef(lambda mm, i: mm.lds.ds1(i))(params, rest, h1)
report("ds2 (full)     ", stagef(lambda mm, i: mm.lds.ds2(i)),
       params, rest, h2)

# bwd attribution
report("bwd conv1 block", gradf(lambda mm, i: mm.lds.conv(i)),
       params, rest, x)
report("bwd ds1        ", gradf(lambda mm, i: mm.lds.ds1(i)),
       params, rest, h1)
report("bwd ds2        ", gradf(lambda mm, i: mm.lds.ds2(i)),
       params, rest, h2)
