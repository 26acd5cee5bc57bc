"""Model-zoo shape/grad smoke tests (SURVEY.md §4.3): every contract model
builds, forwards at a stride-compatible size, returns full-res logits, and
produces finite gradients under the shared train step.
"""

import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from torch_semantic_segmentation_tpu import models
from torch_semantic_segmentation_tpu.losses import aux_weighted_loss, cross_entropy_loss
from torch_semantic_segmentation_tpu.train import (
    OptimizerConfig, create_train_state, make_train_step)

# (name, kwargs, input H/W divisor)
ZOO = [
    ("enet", {}, 8),
    ("fastscnn", {}, 32),
    ("unet", {"base_ch": 8}, 16),
    ("deeplabv3_resnet18", {}, 32),
    ("bisenet", {}, 32),
    ("icnet", {"depth": 18}, 32),
    ("contextnet", {}, 32),
    ("lednet", {}, 16),
    ("erfnet", {}, 8),
    ("esnet", {}, 8),
]


def _maybe(name):
    try:
        models.get_model(name, 19)
        return False
    except KeyError:
        return True


@pytest.mark.parametrize("name,kwargs,div", ZOO)
@pytest.mark.slow
def test_forward_shapes(name, kwargs, div):
    m = models.get_model(name, num_classes=19, **kwargs)
    m.eval()
    h = w = div * 2
    x = jnp.zeros((2, h, w, 3), jnp.float32)
    y = m(x)
    if isinstance(y, (tuple, list)):
        y = y[0]
    assert y.shape == (2, h, w, 19)


@pytest.mark.parametrize("name,kwargs,div", ZOO)
@pytest.mark.slow
def test_train_step_finite(name, kwargs, div):
    m = models.get_model(name, num_classes=7, **kwargs)
    tx = OptimizerConfig(lr=0.01, max_steps=10).make()
    gd, _, state = create_train_state(m, tx)

    def loss_fn(outputs, labels):
        outs = outputs if isinstance(outputs, (tuple, list)) else [outputs]
        return aux_weighted_loss(outs, labels, loss_fn=cross_entropy_loss)

    step = make_train_step(gd, tx, loss_fn)
    h = w = div * 2
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, h, w, 3), jnp.float32)
    labels = jax.random.randint(key, (2, h, w), 0, 7)
    state, metrics = step(state, x, labels)
    assert jnp.isfinite(metrics["loss"])


@pytest.mark.slow
def test_fastscnn_aux_heads():
    m = models.get_model("fastscnn", num_classes=5, aux=True)
    m.eval()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    main, a1, a2 = m(x)
    assert main.shape == (1, 64, 64, 5)
    assert a1.shape == (1, 8, 8, 5)       # 1/8 res
    assert a2.shape == (1, 2, 2, 5)       # 1/32 res


@pytest.mark.slow
def test_bisenet_icnet_aux_count():
    for name, kw in (("bisenet", {"depth": 18}), ("icnet", {"depth": 18})):
        m = models.get_model(name, num_classes=5, aux=True, **kw)
        m.eval()
        outs = m(jnp.zeros((1, 64, 64, 3), jnp.float32))
        assert len(outs) == 3
        assert outs[0].shape == (1, 64, 64, 5)


def test_deeplab_output_stride_8_and_aux():
    m = models.get_model("deeplabv3_resnet18", num_classes=5,
                         output_stride=8, aux=True)
    m.eval()
    main, aux = m(jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert main.shape == (1, 64, 64, 5)
    assert aux.shape == (1, 8, 8, 5)      # stage-3 grid at output-stride 8


def test_unet_bilinear_decoder_variant():
    m = models.get_model("unet", num_classes=5, base_ch=8, upsample="bilinear")
    m.eval()
    y = m(jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert y.shape == (1, 32, 32, 5)


def test_registry_lists_models():
    avail = models.available_models()
    for name in ("enet", "fastscnn", "unet", "deeplabv3_resnet50",
                 "bisenet", "icnet"):
        assert name in avail, avail


@pytest.mark.parametrize("name,kwargs,div", [
    ("fastscnn", {}, 32),
    ("deeplabv3_resnet18", {}, 32),
    ("bisenet", {}, 32),
    ("icnet", {"depth": 18}, 32),
    ("contextnet", {}, 32),
    ("lednet", {}, 16),
])
@pytest.mark.slow
def test_lowres_logits_plus_fused_loss_matches_fullres(name, kwargs, div):
    """upsample_logits=False + resize_cross_entropy_loss ==
    full-res logits + plain CE (identical parameters, identical loss)."""
    from torch_semantic_segmentation_tpu.losses import (
        resize_cross_entropy_loss)

    h = w = div * 2
    x = jax.random.normal(jax.random.key(0), (1, h, w, 3), jnp.float32)
    labels = jax.random.randint(jax.random.key(1), (1, h, w), 0, 7)

    m_full = models.get_model(name, num_classes=7, **kwargs)
    m_low = models.get_model(name, num_classes=7, upsample_logits=False,
                             **kwargs)
    m_full.eval()
    m_low.eval()

    def main_logits(out):
        return out[0] if isinstance(out, (tuple, list)) else out

    full = cross_entropy_loss(main_logits(m_full(x)), labels)
    low = resize_cross_entropy_loss(main_logits(m_low(x)), labels)
    assert abs(float(full) - float(low)) < 1e-4, (float(full), float(low))
