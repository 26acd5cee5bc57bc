"""Serving path: folded-BN jit predictor matches the raw eval model, AOT
compile works, and the overfit-one-batch test proves training dynamics
end-to-end (model + loss + optimizer can drive train mIoU toward 1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

from torch_semantic_segmentation_tpu.data.synthetic import synthetic_batch
from torch_semantic_segmentation_tpu.models import get_model
from torch_semantic_segmentation_tpu.serving import aot_compile, make_predict_fn


def test_predict_fn_matches_eval_model():
    m_ref = get_model("fastscnn", num_classes=5)
    m_srv = get_model("fastscnn", num_classes=5)   # same seed -> same params
    m_ref.eval()
    frames = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (1, 32, 32, 3), np.uint8))
    predict = make_predict_fn(m_srv, output="ids")
    got = predict(frames)
    from torch_semantic_segmentation_tpu.data.transforms import normalize_batch
    want = jnp.argmax(m_ref(normalize_batch(frames)), axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert got.dtype == jnp.uint8


def test_aot_compile_executes():
    m = get_model("enet", num_classes=4)
    predict = make_predict_fn(m, output="logits")
    compiled = aot_compile(predict, 1, 16, 16)
    out = compiled(jnp.zeros((1, 16, 16, 3), jnp.uint8))
    assert out.shape == (1, 16, 16, 4)


@pytest.mark.slow
def test_overfit_one_batch():
    """Training dynamics: 40 steps on one tiny batch must push train
    accuracy way above chance (validates model/loss/optimizer wiring beyond
    'loss decreases')."""
    from torch_semantic_segmentation_tpu.losses import resize_cross_entropy_loss
    from torch_semantic_segmentation_tpu.metrics import (
        iou_from_confusion_matrix, new_confusion_matrix,
        update_confusion_matrix)
    from torch_semantic_segmentation_tpu.train import (
        OptimizerConfig, create_train_state, make_train_step)

    num_classes = 4
    model = get_model("fastscnn", num_classes=num_classes,
                      upsample_logits=False)
    tx = OptimizerConfig(lr=0.05, momentum=0.9, weight_decay=0.0,
                         max_steps=80).make()
    gd_train, gd_eval, state = create_train_state(model, tx)
    step = make_train_step(gd_train, tx, resize_cross_entropy_loss)

    images, labels = synthetic_batch(2, 32, 32, num_classes,
                                     ignore_frac=0.0, seed=5)
    images, labels = jnp.asarray(images), jnp.asarray(labels)
    first = None
    for _ in range(60):
        state, metrics = step(state, images, labels)
        first = first or float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first * 0.5, (first, last)

    # overfit check uses batch-norm BATCH stats (what the loss optimised;
    # 2-sample running stats are too noisy for an eval-mode check) with
    # dropout off
    fit_model = nnx.merge(gd_train, state.params, state.rest)
    for path, mod in nnx.iter_graph(fit_model):
        if isinstance(mod, nnx.Dropout):
            mod.deterministic = True
    logits = fit_model(images)           # 1/8 res (upsample_logits=False)
    from torch_semantic_segmentation_tpu.ops import resize_bilinear
    logits = resize_bilinear(logits, (32, 32))
    preds = jnp.argmax(logits, axis=-1)
    cm = update_confusion_matrix(new_confusion_matrix(num_classes), preds,
                                 labels)
    _, miou = iou_from_confusion_matrix(cm)
    acc = float(jnp.mean((preds == labels)))
    assert acc > 0.9, (acc, miou)


def test_resize_argmax_matches_composition():
    import numpy as np
    from torch_semantic_segmentation_tpu.ops import (
        resize_argmax, resize_bilinear)

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 8, 12, 19)).astype(np.float32))
    got = resize_argmax(logits, (32, 48))
    want = jnp.argmax(resize_bilinear(logits, (32, 48)), axis=-1)
    assert got.dtype == jnp.uint8
    # fp32 path: identical up to argmax ties on exactly-equal values
    mismatch = float(jnp.mean((got.astype(jnp.int32)
                               != want.astype(jnp.int32)).astype(jnp.float32)))
    assert mismatch < 1e-3, mismatch


def test_predict_fn_low_res_logits_ids():
    """A model built with upsample_logits=False must serve the same class
    ids as the full-res variant (fused lane-major resize+argmax path)."""
    import numpy as np
    from flax import nnx
    from torch_semantic_segmentation_tpu.models import get_model

    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.integers(0, 256, (1, 64, 96, 3), dtype=np.uint8))
    ids = {}
    for flag in (True, False):
        model = get_model("fastscnn", num_classes=7, upsample_logits=flag,
                          rngs=nnx.Rngs(0))
        predict = make_predict_fn(model, output="ids")
        out = predict(frames)
        assert out.shape == (1, 64, 96)
        ids[flag] = np.asarray(out)
    mismatch = (ids[True] != ids[False]).mean()
    assert mismatch < 0.01, mismatch


def test_predict_fn_low_res_probs_match_full_res():
    """output='probs' on a low-res-logit model resizes logits before the
    softmax and must match the upsample_logits=True twin."""
    import numpy as np
    from flax import nnx
    from torch_semantic_segmentation_tpu.models import get_model

    rng = np.random.default_rng(2)
    frames = jnp.asarray(rng.integers(0, 256, (1, 64, 64, 3), dtype=np.uint8))
    probs = {}
    for flag in (True, False):
        model = get_model("contextnet", num_classes=5, upsample_logits=flag,
                          rngs=nnx.Rngs(0))
        out = make_predict_fn(model, output="probs")(frames)
        assert out.shape == (1, 64, 64, 5)
        probs[flag] = np.asarray(out)
    np.testing.assert_allclose(probs[True], probs[False], rtol=1e-4,
                               atol=1e-5)
