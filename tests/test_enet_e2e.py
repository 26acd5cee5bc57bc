"""Contract config 1 (BASELINE.json): ENet, Cityscapes-shaped crops,
single-device fwd + CE loss, CPU-runnable; loss decreases over N steps
(SURVEY.md §4.3). Small spatial size to keep CI fast on 1 CPU core."""

import numpy as np

import jax.numpy as jnp
from flax import nnx

from torch_semantic_segmentation_tpu.data.synthetic import synthetic_batch
from torch_semantic_segmentation_tpu.losses import cross_entropy_loss
from torch_semantic_segmentation_tpu.models import enet, get_model
from torch_semantic_segmentation_tpu.train import (
    OptimizerConfig,
    create_train_state,
    make_eval_step,
    make_train_step,
)


def test_enet_forward_shape():
    model = enet(num_classes=19, rngs=nnx.Rngs(0))
    model.eval()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    y = model(x)
    assert y.shape == (1, 64, 64, 19)


def test_registry_has_enet():
    m = get_model("enet", num_classes=5)
    m.eval()
    assert m(jnp.zeros((1, 32, 32, 3))).shape == (1, 32, 32, 5)


def test_enet_train_loss_decreases():
    model = enet(num_classes=7, rngs=nnx.Rngs(0))
    tx = OptimizerConfig(lr=0.05, max_steps=100).make()
    gd_train, gd_eval, state = create_train_state(model, tx)
    step = make_train_step(gd_train, tx)

    images, labels = synthetic_batch(2, 32, 32, num_classes=7, seed=1)
    images, labels = jnp.asarray(images), jnp.asarray(labels)

    losses = []
    for _ in range(8):
        state, metrics = step(state, images, labels)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8

    # eval path: confusion matrix accumulates and yields a finite mIoU
    from torch_semantic_segmentation_tpu.metrics import (
        iou_from_confusion_matrix, new_confusion_matrix)
    eval_step = make_eval_step(gd_eval, num_classes=7)
    cm = new_confusion_matrix(7)
    cm = eval_step(state.params, state.rest, cm, images, labels)
    _, miou = iou_from_confusion_matrix(cm)
    assert 0.0 <= miou <= 1.0
