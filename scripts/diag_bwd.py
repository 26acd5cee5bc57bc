"""Diagnostic: bisect FastSCNN train-step cost (batch 16, 512x512)."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import optax as _ox
from flax import nnx

from torch_semantic_segmentation_tpu.losses import cross_entropy_loss
from torch_semantic_segmentation_tpu.models.fastscnn import fastscnn
from torch_semantic_segmentation_tpu.train import (
    OptimizerConfig, TrainState, create_train_state)

x = jnp.zeros((16, 512, 512, 3), jnp.bfloat16)
y = jnp.zeros((16, 512, 512), jnp.int32)


def timed_chain(f, init, n=5):
    s = f(init)
    _ = float(jnp.sum(jax.tree.leaves(s)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        s = f(s)
    _ = float(jnp.sum(jax.tree.leaves(s)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


m6 = fastscnn(19, dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
tx6 = OptimizerConfig(max_steps=100).make()
gdt6, _, st6 = create_train_state(m6, tx6)


def body(state, with_opt, with_metrics):
    model = nnx.merge(gdt6, state.params, state.rest)

    def compute_loss(model):
        return cross_entropy_loss(model(x), y)

    loss, grads = nnx.value_and_grad(compute_loss)(model)
    _, params, new_rest = nnx.split(model, nnx.Param, ...)
    if with_opt:
        updates, new_opt = tx6.update(grads, state.opt_state, params)
        new_params = _ox.apply_updates(params, updates)
    else:
        new_params = jax.tree.map(lambda a, b: a - 0.0 * b, params, grads)
        new_opt = state.opt_state
    ns = TrainState(new_params, new_rest, new_opt, state.step + 1)
    return (ns, {"loss": loss}) if with_metrics else ns


for wo, wm in []:
    jf = jax.jit(lambda s, _wo=wo, _wm=wm: body(s, _wo, _wm))

    def g(s, _jf=jf, _wm=wm):
        r = _jf(s)
        return r[0] if _wm else r

    print(f"body opt={wo} metrics={wm}: {timed_chain(g, st6):.1f} ms",
          flush=True)


# scalar output is the poison: try 1-d and padded metric shapes
def body2(state, shape):
    model = nnx.merge(gdt6, state.params, state.rest)
    def compute_loss(model):
        return cross_entropy_loss(model(x), y)
    loss, grads = nnx.value_and_grad(compute_loss)(model)
    _, params, new_rest = nnx.split(model, nnx.Param, ...)
    updates, new_opt = tx6.update(grads, state.opt_state, params)
    new_params = _ox.apply_updates(params, updates)
    ns = TrainState(new_params, new_rest, new_opt, state.step + 1)
    return ns, jnp.broadcast_to(loss, shape)

keep = []
jf = jax.jit(lambda s: body2(s, (1,)))
def g(s, _jf=jf):
    ns, loss = _jf(s)
    keep.append(loss)          # hold the reference: no buffer GC mid-loop
    return ns
print(f"loss held (no GC): {timed_chain(g, st6):.1f} ms", flush=True)
