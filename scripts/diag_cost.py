"""Compare XLA cost analysis: step returning state vs (state, loss)."""
import sys; sys.path.insert(0, "/root/repo")

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
m = fastscnn(19, dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
tx = OptimizerConfig(max_steps=100).make()
gd, _, st = create_train_state(m, tx)


def body(state, with_metrics):
    model = nnx.merge(gd, state.params, state.rest)

    def compute_loss(model):
        return cross_entropy_loss(model(x), y)

    loss, grads = nnx.value_and_grad(compute_loss)(model)
    _, params, new_rest = nnx.split(model, nnx.Param, ...)
    updates, new_opt = tx.update(grads, state.opt_state, params)
    new_params = _ox.apply_updates(params, updates)
    ns = TrainState(new_params, new_rest, new_opt, state.step + 1)
    return (ns, loss) if with_metrics else ns


for wm in (False, True):
    c = jax.jit(lambda s, _wm=wm: body(s, _wm)).lower(st).compile()
    ca = c.cost_analysis()
    print(f"with_metrics={wm}: flops={ca.get('flops', 0):.3e} "
          f"bytes={ca.get('bytes accessed', 0):.3e} "
          f"transcend={ca.get('transcendentals', 0):.3e}", flush=True)
