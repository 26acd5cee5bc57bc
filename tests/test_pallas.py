"""Pallas kernel tests (interpret mode on the CPU test backend): the fused
upsample+concat skip kernel must match the XLA matmul-resize reference
bit-closely in fp32 and agree under autodiff (custom VJP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_semantic_segmentation_tpu.ops.pallas_upsample import (
    _fused, _reference, upsample2x_concat)

SHAPES = [(8, 16, 4, 4), (6, 10, 3, 5), (16, 8, 128, 64), (4, 4, 1, 2)]


@pytest.mark.parametrize("h,w,cl,cs", SHAPES)
def test_forward_matches_reference(h, w, cl, cs):
    rng = np.random.default_rng(0)
    low = jnp.asarray(rng.normal(size=(2, h, w, cl)).astype(np.float32))
    skip = jnp.asarray(rng.normal(size=(2, 2 * h, 2 * w, cs)).astype(np.float32))
    got = _fused(low, skip, True)           # interpret mode
    want = _reference(low, skip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    rng = np.random.default_rng(1)
    low = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    skip = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
    gp = jax.grad(lambda l, s: jnp.sum(jnp.sin(_fused(l, s, True))), (0, 1))(
        low, skip)
    gr = jax.grad(lambda l, s: jnp.sum(jnp.sin(_reference(l, s))), (0, 1))(
        low, skip)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               rtol=1e-5, atol=1e-5)


def test_auto_dispatch_falls_back_on_cpu():
    # on the CPU test backend the public API must take the XLA path
    low = jnp.zeros((1, 4, 4, 2))
    skip = jnp.ones((1, 8, 8, 3))
    out = upsample2x_concat(low, skip)
    assert out.shape == (1, 8, 8, 5)
    np.testing.assert_array_equal(np.asarray(out[..., 2:]), 1.0)


def test_unet_bilinear_uses_fused_path():
    from flax import nnx
    from torch_semantic_segmentation_tpu.models import get_model

    m = get_model("unet", num_classes=3, base_ch=4, upsample="bilinear")
    m.eval()
    y = m(jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert y.shape == (1, 32, 32, 3)
