"""Confusion-matrix mIoU vs numpy oracle (SURVEY.md §4.1)."""

import numpy as np
import pytest

import jax.numpy as jnp

from torch_semantic_segmentation_tpu.metrics import (
    iou_from_confusion_matrix,
    new_confusion_matrix,
    pixel_accuracy_from_confusion_matrix,
    update_confusion_matrix,
)


def _oracle_cm(preds, labels, c, ignore=255):
    valid = labels != ignore
    t, p = labels[valid].astype(int), preds[valid].astype(int)
    return np.bincount(t * c + p, minlength=c * c).reshape(c, c).astype(np.float64)


def test_confusion_matrix_matches_bincount_oracle():
    rng = np.random.default_rng(0)
    c = 19
    labels = rng.integers(0, c, (2, 32, 32))
    labels = np.where(rng.random(labels.shape) < 0.1, 255, labels)
    preds = rng.integers(0, c, (2, 32, 32))

    cm = new_confusion_matrix(c)
    cm = update_confusion_matrix(cm, jnp.asarray(preds), jnp.asarray(labels))
    # accumulate a second batch
    cm = update_confusion_matrix(cm, jnp.asarray(preds), jnp.asarray(labels))
    oracle = 2 * _oracle_cm(preds, labels, c)
    np.testing.assert_array_equal(np.asarray(cm), oracle)

    iou, miou = iou_from_confusion_matrix(cm)
    inter = np.diag(oracle)
    union = oracle.sum(0) + oracle.sum(1) - inter
    ref_iou = inter / union
    np.testing.assert_allclose(iou, ref_iou, rtol=1e-9)
    assert abs(miou - np.nanmean(ref_iou)) < 1e-9


def test_perfect_prediction_iou_is_one():
    c = 4
    labels = np.tile(np.arange(c), 64).reshape(1, 16, 16)
    cm = update_confusion_matrix(new_confusion_matrix(c), jnp.asarray(labels),
                                 jnp.asarray(labels))
    iou, miou = iou_from_confusion_matrix(cm)
    assert miou == 1.0
    assert pixel_accuracy_from_confusion_matrix(cm) == 1.0


def test_absent_class_is_nan_not_zero():
    c = 3
    labels = np.zeros((1, 8, 8), np.int32)  # only class 0 present
    preds = np.zeros((1, 8, 8), np.int32)
    cm = update_confusion_matrix(new_confusion_matrix(c), jnp.asarray(preds),
                                 jnp.asarray(labels))
    iou, miou = iou_from_confusion_matrix(cm)
    assert np.isnan(iou[1]) and np.isnan(iou[2])
    assert miou == 1.0  # nan-mean over supported classes


@pytest.mark.slow
def test_eval_step_low_res_logits_matches_full_res():
    """make_eval_step must evaluate upsample_logits=False models via the
    fused lane-major resize+argmax, matching the full-res twin's confusion
    matrix."""
    import numpy as np
    from flax import nnx
    from torch_semantic_segmentation_tpu.models import get_model
    from torch_semantic_segmentation_tpu.train import (
        create_train_state, make_eval_step, OptimizerConfig)
    from torch_semantic_segmentation_tpu.metrics import new_confusion_matrix

    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    lbls = jnp.asarray(rng.integers(0, 5, (1, 64, 64), dtype=np.int32))
    tx = OptimizerConfig(max_steps=5).make()
    cms = {}
    for flag in (True, False):
        model = get_model("fastscnn", num_classes=5, upsample_logits=flag,
                          rngs=nnx.Rngs(0))
        _, gde, state = create_train_state(model, tx)
        ev = make_eval_step(gde, num_classes=5)
        cms[flag] = np.asarray(ev(state.params, state.rest,
                                  new_confusion_matrix(5), imgs, lbls))
    assert cms[True].sum() == cms[False].sum() == 64 * 64
    # identical up to argmax ties at class-boundary pixels
    assert np.abs(cms[True] - cms[False]).sum() <= 2
