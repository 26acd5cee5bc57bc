"""Fused resize+CE Pallas kernel (ops/pallas_resize_ce.py): forward and
custom-VJP parity vs the XLA path (losses.resize_cross_entropy_loss), in
interpret mode (CPU tier; the TPU-compiled path is exercised by the bench).

Tolerances are bf16-scale: the kernel upsamples H-then-W with f32 MXU
accumulation while the XLA path goes W-then-H with bf16 accumulation —
same 2-hot bilinear math, different rounding order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_semantic_segmentation_tpu.losses import resize_cross_entropy_loss
from torch_semantic_segmentation_tpu.ops import pallas_resize_ce as prce

# (logits shape NHWC, label HW) — OW % 128 == 0, ratios the heads use
CASES = [((2, 8, 16, 19), (64, 128)),     # ×8, one row tile
         ((1, 16, 16, 19), (128, 128)),   # ×8, two row tiles (revisit path)
         ((2, 8, 32, 4), (32, 128))]      # ×4, small C
FAST_CASES = CASES[:1]


def _data(lshape, yshape, *, weights, seed=0):
    rng = np.random.default_rng(seed)
    n, h, w, c = lshape
    logits = jnp.asarray(rng.normal(size=lshape) * 2.0, jnp.bfloat16)
    labels = rng.integers(0, c, (n, *yshape)).astype(np.int32)
    labels[:, :3, :5] = 255                      # ignored pixels
    cw = (jnp.asarray(rng.uniform(0.5, 2.0, (c,)), jnp.float32)
          if weights else None)
    return logits, jnp.asarray(labels), cw


def _check(lshape, yshape, weights, align_corners):
    logits, labels, cw = _data(lshape, yshape, weights=weights)
    assert prce.supports(logits.shape, labels.shape, logits.dtype)

    got = prce.resize_cross_entropy(logits, labels, cw,
                                    align_corners=align_corners,
                                    interpret=True)
    ref = resize_cross_entropy_loss(logits, labels, class_weights=cw,
                                    align_corners=align_corners)
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-2)

    gfun = jax.grad(lambda lg: prce.resize_cross_entropy(
        lg, labels, cw, align_corners=align_corners, interpret=True))
    rfun = jax.grad(lambda lg: resize_cross_entropy_loss(
        lg, labels, class_weights=cw, align_corners=align_corners))
    dgot = np.asarray(gfun(logits), np.float32)
    dref = np.asarray(rfun(logits), np.float32)
    assert dgot.shape == dref.shape
    np.testing.assert_allclose(dgot, dref, rtol=8e-2,
                               atol=2e-2 * np.abs(dref).max())


@pytest.mark.parametrize("lshape,yshape", FAST_CASES)
def test_resize_ce_parity_fast(lshape, yshape):
    _check(lshape, yshape, weights=False, align_corners=False)


@pytest.mark.slow
@pytest.mark.parametrize("lshape,yshape", CASES)
@pytest.mark.parametrize("weights", [False, True])
@pytest.mark.parametrize("align_corners", [False, True])
def test_resize_ce_parity(lshape, yshape, weights, align_corners):
    _check(lshape, yshape, weights, align_corners)


def test_supports_guards():
    bf, f32 = jnp.bfloat16, jnp.float32
    ok = ((2, 8, 16, 19), (2, 64, 128))
    assert prce.supports(*ok, bf)
    assert not prce.supports(*ok, f32)                    # fp32 falls back
    assert not prce.supports((2, 8, 16, 19), (2, 64, 100), bf)   # OW % 128
    assert not prce.supports((2, 8, 16, 19), (2, 8, 16), bf)     # no resize
    assert not prce.supports(*ok, bf, ignore_index=5)     # inside [0, C)
    assert not prce.supports((2, 8, 16, 40), (2, 64, 128), bf)   # C > 32


def test_all_ignored_is_zero():
    logits, labels, _ = _data((2, 8, 16, 19), (64, 128), weights=False)
    labels = jnp.full_like(labels, 255)
    got = prce.resize_cross_entropy(logits, labels, interpret=True)
    assert float(got) == 0.0
