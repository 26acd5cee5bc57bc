"""Training core (T6 in SURVEY.md §1): the whole optimisation step —
forward, backward, optimizer update, LR schedule, and (under a sharded mesh)
the gradient all-reduce — is ONE jit-compiled XLA program with donated
buffers, replacing the reference's eager ignite Engine + apex AMP + DDP
hooks (SURVEY.md §3.1).

Design:
- Models are flax.nnx modules; we `nnx.split` once on the host into
  (graphdef, params, rest) where `rest` carries BatchNorm running stats and
  dropout RNG state, then run a *pure* step function under `jax.jit` with
  `donate_argnums` so param/opt buffers update in place in HBM.
- Two graphdefs are captured (train mode / eval mode) so BN/dropout mode is
  a static property of the compiled program — no traced branching.
- bf16 compute / fp32 params ("AMP O2" equivalent, no loss scaling needed on
  TPU — SURVEY.md §2.6).
- Data parallelism: pass a `jax.sharding.Mesh` + batch sharded over the
  'data' axis; params replicated. XLA/GSPMD inserts the psum over ICI
  (SURVEY.md §2.4). No hand-written communication.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from torch_semantic_segmentation_tpu.losses import cross_entropy_loss


class TrainState(tp.NamedTuple):
    """Pure pytree train state (donate-friendly)."""
    params: tp.Any       # nnx.State of nnx.Param
    rest: tp.Any         # nnx.State of everything else (BN stats, RNG counts)
    opt_state: tp.Any
    step: jax.Array


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """SGD-momentum + poly LR decay — the reference's recipe (SURVEY.md §2.6).

    lr(t) = lr * (1 - t/max_steps)^power; weight decay as in torch SGD
    (coupled, applied to the gradient before momentum).
    """
    lr: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 1e-4
    power: float = 0.9
    max_steps: int = 10_000
    optimizer: str = "sgd"  # or "adamw"

    def make(self) -> optax.GradientTransformation:
        schedule = optax.polynomial_schedule(
            init_value=self.lr, end_value=0.0,
            power=self.power, transition_steps=self.max_steps)
        if self.optimizer == "sgd":
            chain = []
            if self.weight_decay:
                chain.append(optax.add_decayed_weights(self.weight_decay))
            chain += [
                optax.trace(decay=self.momentum, nesterov=False),
                optax.scale_by_learning_rate(schedule),
            ]
            return optax.chain(*chain)
        elif self.optimizer == "adamw":
            return optax.adamw(schedule, weight_decay=self.weight_decay)
        raise ValueError(self.optimizer)


def split_train_eval(model: nnx.Module):
    """Capture train-mode and eval-mode graphdefs plus the initial state.

    Returns (graphdef_train, graphdef_eval, params, rest). Mode (BN
    use_running_average, dropout deterministic) is static per graphdef.
    """
    model.train()
    graphdef_train, params, rest = nnx.split(model, nnx.Param, ...)
    model.eval()
    graphdef_eval, _, _ = nnx.split(model, nnx.Param, ...)
    model.train()
    return graphdef_train, graphdef_eval, params, rest


def create_train_state(model: nnx.Module, tx: optax.GradientTransformation):
    gd_train, gd_eval, params, rest = split_train_eval(model)
    opt_state = tx.init(params)
    state = TrainState(params=params, rest=rest, opt_state=opt_state,
                       step=jnp.zeros((), jnp.int32))
    return gd_train, gd_eval, state


LossFn = tp.Callable[[tp.Any, jax.Array], jax.Array]
# LossFn(model_outputs, labels) -> scalar


def make_train_step(
    graphdef: nnx.GraphDef,
    tx: optax.GradientTransformation,
    loss_fn: LossFn | None = None,
    *,
    donate: bool = True,
    jit: bool = True,
    remat: bool = False,
):
    """Build the compiled train step: state, images, labels -> state, metrics.

    `loss_fn(outputs, labels)` defaults to plain CE with ignore_index=255.
    The returned function is pure; under a mesh, shard `images`/`labels`
    over 'data' and leave state replicated — GSPMD handles the rest.

    `remat=True` rematerialises the forward during backward
    (jax.checkpoint via nnx.remat) — trades ~⅓ more FLOPs for dropping all
    forward activations from HBM, the full-res memory lever of SURVEY.md §7
    ("Full-res memory") / §5 ("long-context" analog).
    """
    if loss_fn is None:
        loss_fn = lambda outputs, labels: cross_entropy_loss(outputs, labels)

    def step(state: TrainState, images: jax.Array, labels: jax.Array):
        model = nnx.merge(graphdef, state.params, state.rest)

        def compute_loss(model):
            def fwd(model, images):
                if remat:
                    # under remat the fused expand→dw kernel's forward
                    # would run twice and its residual saving is moot —
                    # measured 8% slower at the crop remat tier
                    # (ops/pallas_mbconv.suppress_routing)
                    from torch_semantic_segmentation_tpu.ops import (
                        pallas_mbconv)
                    with pallas_mbconv.suppress_routing():
                        return model(images)
                return model(images)
            if remat:
                fwd = nnx.remat(fwd)
            return loss_fn(fwd(model, images), labels)

        # nnx.value_and_grad lifts BN-stat / RNG mutations across the grad
        # boundary (plain jax.grad would trip nnx's trace-level guard).
        loss, grads = nnx.value_and_grad(compute_loss)(model)
        _, params, new_rest = nnx.split(model, nnx.Param, ...)
        updates, new_opt = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_state = TrainState(params=new_params, rest=new_rest,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, {"loss": loss}

    if jit:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    return step


def make_eval_step(graphdef_eval: nnx.GraphDef, *, num_classes: int,
                   ignore_index: int = 255, jit: bool = True):
    """Compiled eval step: (params, rest, cm, images, labels) -> cm.

    Accumulates the on-device confusion matrix (SURVEY.md §3.3); only the
    final (C, C) matrix leaves the device at the end of the epoch.
    """
    from torch_semantic_segmentation_tpu.metrics import update_confusion_matrix

    def step(params, rest, cm, images, labels):
        from torch_semantic_segmentation_tpu.ops import resize_argmax

        model = nnx.merge(graphdef_eval, params, rest)
        logits = model(images)
        if isinstance(logits, (tuple, list)):
            logits = logits[0]
        from torch_semantic_segmentation_tpu.ops import packed_ops

        logits = packed_ops.as_nhwc(logits)
        if logits.shape[1:3] != labels.shape[1:3]:
            # upsample_logits=False model: fused lane-major upsample+argmax
            preds = resize_argmax(
                logits, (labels.shape[1], labels.shape[2]),
                align_corners=bool(getattr(model, "align_corners", False)),
                out_dtype=jnp.int32)
        else:
            preds = jnp.argmax(logits, axis=-1)
        return update_confusion_matrix(cm, preds, labels,
                                       ignore_index=ignore_index)

    if jit:
        return jax.jit(step, donate_argnums=(2,))
    return step
