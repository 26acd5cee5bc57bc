"""Loss parity vs torch-cpu oracle incl. ignore_index edge cases
(SURVEY.md §4.1)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from torch_semantic_segmentation_tpu.losses import (
    aux_weighted_loss,
    cross_entropy_loss,
    ohem_cross_entropy,
)


def _make(seed=0, n=2, h=8, w=8, c=5, ignore_frac=0.2):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(n, h, w, c)).astype(np.float32)
    labels = rng.integers(0, c, (n, h, w)).astype(np.int32)
    mask = rng.random((n, h, w)) < ignore_frac
    labels = np.where(mask, 255, labels).astype(np.int64)
    return logits, labels


@pytest.mark.parametrize("weighted", [False, True])
def test_cross_entropy_parity(weighted):
    logits, labels = _make()
    c = logits.shape[-1]
    w = np.random.default_rng(1).uniform(0.5, 2.0, c).astype(np.float32) if weighted else None

    ref = F.cross_entropy(
        torch.tensor(logits).permute(0, 3, 1, 2),
        torch.tensor(labels),
        weight=torch.tensor(w) if weighted else None,
        ignore_index=255,
    ).item()

    out = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels),
                             ignore_index=255,
                             class_weights=jnp.asarray(w) if weighted else None)
    np.testing.assert_allclose(float(out), ref, atol=1e-5, rtol=1e-5)


def test_cross_entropy_all_ignored_is_finite():
    logits, labels = _make()
    labels[:] = 255
    out = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))
    assert np.isfinite(float(out)) and float(out) == 0.0


def _ohem_oracle(logits, labels, thresh, min_kept, ignore=255):
    """numpy oracle: keep loss >= min(-log(thresh), kth largest), mean."""
    t = torch.tensor(logits).permute(0, 3, 1, 2)
    l = torch.tensor(labels)
    per_px = F.cross_entropy(t, l, ignore_index=ignore, reduction="none").numpy()
    valid = labels != ignore
    flat = per_px.reshape(-1)
    vflat = valid.reshape(-1)
    k = min(min_kept, flat.size)
    vals = np.where(vflat, flat, -np.inf)
    kth = np.sort(vals)[::-1][k - 1]
    threshold = min(-math.log(thresh), kth)
    keep = vflat & (flat >= threshold)
    return flat[keep].mean()


@pytest.mark.parametrize("min_kept", [10, 50])
def test_ohem_exact_parity(min_kept):
    logits, labels = _make(seed=3)
    ref = _ohem_oracle(logits, labels, 0.7, min_kept)
    out = ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                             thresh=0.7, min_kept=min_kept, exact=True)
    np.testing.assert_allclose(float(out), ref, atol=1e-5, rtol=1e-5)


def test_ohem_histogram_close_to_exact():
    logits, labels = _make(seed=4, n=2, h=32, w=32)
    exact = ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                               thresh=0.7, min_kept=200, exact=True)
    approx = ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                thresh=0.7, min_kept=200, exact=False)
    # histogram threshold is one bin below the exact one → keeps slightly
    # more pixels; means should be close
    np.testing.assert_allclose(float(approx), float(exact), rtol=0.05)


def test_aux_weighted_loss_combines_and_resizes():
    logits, labels = _make(seed=5, h=16, w=16)
    aux = logits[:, ::2, ::2]  # half-resolution aux head
    main_only = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))
    total = aux_weighted_loss([jnp.asarray(logits), jnp.asarray(aux)],
                              jnp.asarray(labels), aux_weight=0.4)
    assert float(total) > float(main_only)


def test_resize_cross_entropy_matches_resize_then_ce():
    """Fused NHCW resize+CE == resize_bilinear -> CE (values and grads)."""
    import numpy as np
    from torch_semantic_segmentation_tpu.losses import resize_cross_entropy_loss
    from torch_semantic_segmentation_tpu.ops import resize_bilinear

    import jax

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 6, (2, 64, 96)).astype(np.int32))
    labels = jnp.where(labels == 5, 255, labels)
    cw = np.linspace(0.5, 2.0, 5).astype(np.float32)
    for w in (None, cw):
        a = resize_cross_entropy_loss(logits, labels, class_weights=w)
        b = cross_entropy_loss(resize_bilinear(logits, (64, 96)), labels,
                               class_weights=w)
        assert abs(float(a) - float(b)) < 1e-5
    g1 = jax.grad(lambda l: resize_cross_entropy_loss(l, labels))(logits)
    g2 = jax.grad(lambda l: cross_entropy_loss(
        resize_bilinear(l, (64, 96)), labels))(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


def test_resize_ohem_matches_resize_then_ohem():
    import numpy as np
    from torch_semantic_segmentation_tpu.losses import (
        ohem_cross_entropy, resize_ohem_cross_entropy)
    from torch_semantic_segmentation_tpu.ops import resize_bilinear

    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 6, (2, 64, 96)).astype(np.int32))
    labels = jnp.where(labels == 5, 255, labels)
    a = resize_ohem_cross_entropy(logits, labels, min_kept=500)
    b = ohem_cross_entropy(resize_bilinear(logits, (64, 96)), labels,
                           min_kept=500)
    assert abs(float(a) - float(b)) < 1e-5, (float(a), float(b))
