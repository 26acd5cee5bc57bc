"""Fused on-device augmentation: determinism under fixed PRNG keys, static
shapes, and exactness in the identity/flip corner cases (SURVEY.md §4.1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_semantic_segmentation_tpu.data.synthetic import synthetic_uint8_batch
from torch_semantic_segmentation_tpu.data.transforms import (
    AugmentConfig,
    augment_batch,
    normalize_batch,
)


def _batch(h=32, w=48, n=2, c=7, seed=0):
    imgs, lbls = synthetic_uint8_batch(n, h, w, c, seed=seed)
    return jnp.asarray(imgs), jnp.asarray(lbls)


def _no_jitter(**kw):
    base = dict(brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0)
    base.update(kw)
    return AugmentConfig(**base)


def test_deterministic_under_fixed_key():
    imgs, lbls = _batch()
    cfg = AugmentConfig(crop=(16, 16))
    k = jax.random.key(42)
    a1, l1 = augment_batch(imgs, lbls, k, cfg)
    a2, l2 = augment_batch(imgs, lbls, k, cfg)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    # different key -> different crop
    a3, _ = augment_batch(imgs, lbls, jax.random.key(7), cfg)
    assert not np.array_equal(np.asarray(a1), np.asarray(a3))


def test_static_output_shape():
    imgs, lbls = _batch()
    cfg = AugmentConfig(crop=(24, 16))
    out, lab = augment_batch(imgs, lbls, jax.random.key(0), cfg)
    assert out.shape == (2, 24, 16, 3) and out.dtype == jnp.float32
    assert lab.shape == (2, 24, 16) and lab.dtype == jnp.int32


def test_identity_config_is_exact_normalize():
    imgs, lbls = _batch(h=16, w=16)
    cfg = _no_jitter(crop=(16, 16), scale_range=(1.0, 1.0), hflip_prob=0.0)
    out, lab = augment_batch(imgs, lbls, jax.random.key(0), cfg)
    ref = normalize_batch(imgs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(lbls))


def test_forced_flip_mirrors_exactly():
    imgs, lbls = _batch(h=16, w=16)
    cfg = _no_jitter(crop=(16, 16), scale_range=(1.0, 1.0), hflip_prob=1.0)
    out, lab = augment_batch(imgs, lbls, jax.random.key(0), cfg)
    ref = normalize_batch(imgs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref)[:, :, ::-1],
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(lbls)[:, :, ::-1])


def test_downscale_pads_labels_with_ignore():
    imgs, lbls = _batch(h=16, w=16)
    # scale 0.5 -> scaled image 8x8 inside a 16x16 crop: borders must be 255
    cfg = _no_jitter(crop=(16, 16), scale_range=(0.5, 0.5), hflip_prob=0.0)
    out, lab = augment_batch(imgs, lbls, jax.random.key(0), cfg)
    lab = np.asarray(lab)
    assert (lab == 255).mean() > 0.5  # ~3/4 of the crop is padding
    # centre region keeps real labels
    assert (lab[:, 6:10, 6:10] != 255).all()
    # padded image pixels are exactly the normalised zero (== -mean/std)
    out = np.asarray(out)
    exp = -np.array(cfg.mean) / np.array(cfg.std)
    np.testing.assert_allclose(out[:, 0, 0, :], np.tile(exp, (2, 1)), atol=1e-5)


def test_color_jitter_changes_pixels_but_not_labels():
    imgs, lbls = _batch(h=16, w=16)
    base = _no_jitter(crop=(16, 16), scale_range=(1.0, 1.0), hflip_prob=0.0)
    jit_cfg = AugmentConfig(crop=(16, 16), scale_range=(1.0, 1.0),
                            hflip_prob=0.0, brightness=0.5, contrast=0.5,
                            saturation=0.5, hue=0.1)
    a0, l0 = augment_batch(imgs, lbls, jax.random.key(3), base)
    a1, l1 = augment_batch(imgs, lbls, jax.random.key(3), jit_cfg)
    assert not np.allclose(np.asarray(a0), np.asarray(a1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_upscale_crop_stays_in_bounds():
    imgs, lbls = _batch(h=16, w=16)
    cfg = _no_jitter(crop=(16, 16), scale_range=(2.0, 2.0), hflip_prob=0.0)
    out, lab = augment_batch(imgs, lbls, jax.random.key(1), cfg)
    assert (np.asarray(lab) != 255).all()  # no padding when upscaling
    assert np.isfinite(np.asarray(out)).all()
