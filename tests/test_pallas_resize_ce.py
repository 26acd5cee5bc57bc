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


# ---------------------------------------------------------------------------
# per-pixel loss-map variant (the OHEM building block)

def _xla_loss_map(logits, labels, align_corners=False, ignore_index=255):
    """Reference per-pixel map — the XLA branch of
    losses.resize_ohem_cross_entropy, inlined."""
    from torch_semantic_segmentation_tpu.ops.upsample import (
        resize_bilinear_nhcw)
    c = logits.shape[-1]
    oh, ow = labels.shape[1], labels.shape[2]
    x = resize_bilinear_nhcw(logits, (oh, ow), align_corners=align_corners,
                             out_dtype=logits.dtype)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    xf = x.astype(jnp.float32)
    logz = jax.nn.logsumexp(xf, axis=2)
    onehot = (safe[:, :, None, :]
              == jnp.arange(c, dtype=jnp.int32)[None, None, :, None])
    true_logit = jnp.sum(xf * onehot.astype(jnp.float32), axis=2)
    return jnp.where(valid, logz - true_logit, 0.0)


def _check_map(lshape, yshape, align_corners):
    logits, labels, _ = _data(lshape, yshape, weights=False)
    got = prce.per_pixel_resize_ce(logits, labels,
                                   align_corners=align_corners,
                                   interpret=True)
    ref = _xla_loss_map(logits, labels, align_corners)
    assert got.shape == labels.shape and got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)
    # ignored pixels are exactly zero
    assert float(jnp.abs(got[:, :3, :5]).max()) == 0.0

    # VJP with an arbitrary cotangent map (zero at a block of pixels —
    # the OHEM drop pattern) vs the XLA path's autodiff
    rng = np.random.default_rng(1)
    ct = jnp.asarray(rng.uniform(0, 1, labels.shape), jnp.float32)
    ct = ct.at[:, :, : yshape[1] // 3].set(0.0)
    gfun = jax.grad(lambda lg: jnp.sum(prce.per_pixel_resize_ce(
        lg, labels, align_corners=align_corners, interpret=True) * ct))
    rfun = jax.grad(lambda lg: jnp.sum(
        _xla_loss_map(lg, labels, align_corners) * ct))
    dgot = np.asarray(gfun(logits), np.float32)
    dref = np.asarray(rfun(logits), np.float32)
    np.testing.assert_allclose(dgot, dref, rtol=8e-2,
                               atol=2e-2 * np.abs(dref).max())


@pytest.mark.parametrize("lshape,yshape", FAST_CASES)
def test_loss_map_parity_fast(lshape, yshape):
    _check_map(lshape, yshape, align_corners=False)


@pytest.mark.slow
@pytest.mark.parametrize("lshape,yshape", CASES)
@pytest.mark.parametrize("align_corners", [False, True])
def test_loss_map_parity(lshape, yshape, align_corners):
    _check_map(lshape, yshape, align_corners)


def _force_fused(monkeypatch):
    import functools
    monkeypatch.setattr(prce, "enabled", lambda: True)
    monkeypatch.setattr(prce, "per_pixel_resize_ce",
                        functools.partial(prce.per_pixel_resize_ce,
                                          interpret=True))


def test_resize_ohem_fused_routing_keep_all(monkeypatch):
    """With min_kept >= every pixel the OHEM selection keeps all valid
    pixels, so the fused and XLA paths must agree to kernel tolerance —
    value AND gradient (exercises the losses-module routing itself)."""
    from torch_semantic_segmentation_tpu.losses import (
        resize_ohem_cross_entropy)

    logits, labels, cw = _data((2, 8, 16, 19), (64, 128), weights=True)
    kw = dict(min_kept=10 ** 9, thresh=0.999999, class_weights=cw)
    ref = resize_ohem_cross_entropy(logits, labels, **kw)
    rgrad = jax.grad(lambda lg: resize_ohem_cross_entropy(
        lg, labels, **kw))(logits)

    _force_fused(monkeypatch)
    got = resize_ohem_cross_entropy(logits, labels, **kw)
    ggrad = jax.grad(lambda lg: resize_ohem_cross_entropy(
        lg, labels, **kw))(logits)
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(ggrad, np.float32),
                               np.asarray(rgrad, np.float32), rtol=8e-2,
                               atol=2e-2 * np.abs(np.asarray(rgrad,
                                                             np.float32)).max())


def test_resize_ohem_fused_selects(monkeypatch):
    """Fused OHEM with a small min_kept must average only hard pixels:
    strictly above the keep-everything mean, and with a sparser gradient
    footprint than plain fused resize-CE."""
    from torch_semantic_segmentation_tpu.losses import (
        resize_ohem_cross_entropy)

    _force_fused(monkeypatch)
    logits, labels, _ = _data((2, 8, 16, 19), (64, 128), weights=False)
    # thresh=0.001 → loss threshold -log(0.001)≈6.9, far above typical
    # random-logit losses, so min_kept=256 binds and exactly the ~256
    # hardest pixels are kept
    hard = resize_ohem_cross_entropy(logits, labels, min_kept=256,
                                     thresh=0.001)
    everything = resize_ohem_cross_entropy(logits, labels, min_kept=10 ** 9,
                                           thresh=0.999999)
    assert float(hard) > float(everything)
