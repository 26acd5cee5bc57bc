"""Diagnostic: FastSCNN stage costs at bench scale (b=64, 1024x1024, bf16),
fwd and fwd+bwd, using honest value-fetch timing."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
from flax import nnx

from torch_semantic_segmentation_tpu.models.fastscnn import fastscnn

B, S = 64, 1024
m = fastscnn(19, dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
m.eval()
gd, params, rest = nnx.split(m, nnx.Param, ...)
merge = lambda p: nnx.merge(gd, p, rest)
st = params


def timed(f, *args, n=4):
    out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


x = jnp.zeros((B, S, S, 3), jnp.bfloat16)
stage_in = {}

lds = jax.jit(lambda st, x: merge(st).lds(x))
h1 = lds(st, x)
print(f"fwd lds {tuple(x.shape)}->{tuple(h1.shape)}: {timed(lds, st, x):.1f} ms", flush=True)

gfe = jax.jit(lambda st, h: merge(st).gfe(h))
lo = gfe(st, h1)
print(f"fwd gfe ->{tuple(lo.shape)}: {timed(gfe, st, h1):.1f} ms", flush=True)

ffm = jax.jit(lambda st, a, b: merge(st).ffm(a, b))
fu = ffm(st, h1, lo)
print(f"fwd ffm: {timed(ffm, st, h1, lo):.1f} ms", flush=True)

def tail(st_, f_):
    mm = merge(st_)
    from torch_semantic_segmentation_tpu.ops import resize_bilinear
    y = mm.classifier(f_)
    return resize_bilinear(y, (S, S))
tl = jax.jit(tail)
print(f"fwd classifier+resize: {timed(tl, st, fu):.1f} ms", flush=True)

# grad of each stage wrt params (bwd cost attribution)
def grad_stage(fn, inp):
    def loss(p):
        mm = merge(p)
        return jnp.sum(fn(mm, inp).astype(jnp.float32))
    return jax.jit(lambda p, i: jax.grad(
        lambda pp: jnp.sum(fn(merge(pp), i).astype(jnp.float32)))(p))

g_lds = grad_stage(lambda mm, i: mm.lds(i), x)
_ = g_lds(st, x)
print(f"fwd+bwd lds: {timed(g_lds, st, x):.1f} ms", flush=True)
g_gfe = grad_stage(lambda mm, i: mm.gfe(i), h1)
print(f"fwd+bwd gfe: {timed(g_gfe, st, h1):.1f} ms", flush=True)
