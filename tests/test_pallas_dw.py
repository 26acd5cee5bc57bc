"""Packed-layout Pallas depthwise-3x3 kernels (ops/pallas_dw.py):
forward + custom-VJP parity vs the lax oracle, fp32 and bf16 pair mode,
strides 1 and 2, in interpret mode (CPU tier; the TPU-compiled path is
exercised by the bench/driver)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_semantic_segmentation_tpu.ops.pallas_dw import (
    depthwise_conv3x3, depthwise_conv3x3_reference, supports)


CASES = [((2, 16, 32, 32), 2), ((2, 16, 32, 32), 1),
         ((1, 8, 64, 48), 2), ((1, 8, 64, 48), 1),
         ((2, 12, 32, 64), 1), ((1, 6, 32, 16), 2),
         # pack-factor edge cases (advisor round 2): p=1 (C%128==0) and
         # p=2 (C=64) exercise the P·ρ parity term of _s2_dx_plan that
         # the p>=4 shapes above cannot reach.
         ((1, 4, 8, 128), 2), ((1, 4, 16, 64), 2)]

# stride-2 VJP sweep must include the small-pack-factor cases.
VJP_CASES = CASES[:4] + CASES[-2:]

# interpret-mode pallas is minutes-slow; keep a smoke pair in the fast
# tier and the full sweep in the slow tier (pytest.ini tiering).
FAST_CASES = [((2, 16, 32, 32), 2), ((1, 8, 64, 48), 1)]


@pytest.mark.slow
@pytest.mark.parametrize("shape,stride", CASES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_dw_forward_matches_lax(shape, stride, dtype):
    rng = np.random.default_rng(0)
    n, h, w, c = shape
    x = jnp.asarray(rng.normal(size=shape), dtype)
    k = jnp.asarray(rng.normal(size=(3, 3, c)), dtype)
    assert supports(shape, stride, dtype=dtype)
    y = depthwise_conv3x3(x, k, stride=stride, interpret=True)
    ref = depthwise_conv3x3_reference(
        x.astype(jnp.float32), k.astype(jnp.float32), stride=stride)
    assert y.shape == ref.shape
    tol = 5e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               rtol=1e-2, atol=tol)


@pytest.mark.parametrize("shape,stride", FAST_CASES)
@pytest.mark.parametrize("dtype", [jnp.bfloat16])
def test_dw_vjp_fast_smoke(shape, stride, dtype):
    test_dw_vjp_matches_lax(shape, stride, dtype)


def _fwd_smoke(shape, stride, dtype):
    test_dw_forward_matches_lax(shape, stride, dtype)


@pytest.mark.parametrize("shape,stride", FAST_CASES)
def test_dw_forward_fast_smoke(shape, stride):
    _fwd_smoke(shape, stride, jnp.bfloat16)


@pytest.mark.slow
@pytest.mark.parametrize("shape,stride", VJP_CASES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_dw_vjp_matches_lax(shape, stride, dtype):
    rng = np.random.default_rng(1)
    n, h, w, c = shape
    x = jnp.asarray(rng.normal(size=shape), dtype)
    k = jnp.asarray(rng.normal(size=(3, 3, c)), dtype)
    yshape = depthwise_conv3x3_reference(
        x.astype(jnp.float32), k.astype(jnp.float32), stride=stride).shape
    ct = jnp.asarray(rng.normal(size=yshape), jnp.float32)

    def loss_p(x_, k_):
        y = depthwise_conv3x3(x_, k_, stride=stride, interpret=True)
        return jnp.sum(y.astype(jnp.float32) * ct)

    def loss_r(x_, k_):
        y = depthwise_conv3x3_reference(
            x_.astype(jnp.float32), k_.astype(jnp.float32), stride=stride)
        # round the output like the kernel does, so both paths receive the
        # same (dtype-rounded) cotangent
        return jnp.sum(y.astype(dtype).astype(jnp.float32) * ct)

    gx_p, gk_p = jax.grad(loss_p, argnums=(0, 1))(x, k)
    gx_r, gk_r = jax.grad(loss_r, argnums=(0, 1))(x, k)
    tol = 5e-2 if dtype == jnp.bfloat16 else 1e-4
    # bf16: both paths round dx once at the end, but fma ordering differs
    # -> one-ulp ties; compare with a relative term too.
    np.testing.assert_allclose(np.asarray(gx_p, np.float32),
                               np.asarray(gx_r, np.float32),
                               rtol=2e-2, atol=tol)
    # dk error scales with the reduction size; compare relatively
    np.testing.assert_allclose(np.asarray(gk_p, np.float32),
                               np.asarray(gk_r, np.float32),
                               rtol=2e-2, atol=tol)


@pytest.mark.slow
def test_dw_border_zero_padding():
    """Padding semantics: a kernel of ones on a one-hot input must not
    wrap across W or H borders."""
    for stride in (1, 2):
        for (hh, ww) in ((0, 0), (7, 31), (0, 31), (7, 0)):
            x = np.zeros((1, 8, 32, 32), np.float32)
            x[0, hh, ww, :] = 1.0
            k = jnp.ones((3, 3, 32), jnp.float32)
            y = depthwise_conv3x3(jnp.asarray(x), k, stride=stride,
                                  interpret=True)
            ref = depthwise_conv3x3_reference(jnp.asarray(x),
                                              k, stride=stride)
            np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                       atol=1e-6)


def test_supports_predicate():
    assert supports((1, 8, 32, 32), 2, dtype=jnp.bfloat16)
    assert not supports((1, 8, 32, 32), 2, dilation=2, dtype=jnp.bfloat16)
    assert not supports((1, 8, 30, 32), 2, dtype=jnp.bfloat16)  # W % P
    assert not supports((1, 7, 32, 32), 2, dtype=jnp.bfloat16)  # odd H
    assert supports((1, 7, 32, 32), 1, dtype=jnp.bfloat16)
    assert not supports((1, 8, 32, 31), 2, dtype=jnp.bfloat16)  # odd C
    assert not supports((1, 8, 32, 32), 2, dtype=jnp.float16)
