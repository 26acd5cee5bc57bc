"""Fused expand(1×1, folded BN)→ReLU→dw3×3 kernel (ops/pallas_mbconv.py):
forward + custom-VJP parity vs the XLA oracle in interpret mode, the
supports() gate, and InvertedResidual block routing equivalence. The
TPU-compiled path (incl. the Mosaic strided/negative-index workarounds
documented in the module) is exercised by scripts/diag_mbconv_bisect.py
and the bench."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_semantic_segmentation_tpu.ops.pallas_mbconv import (
    expand_dw_reference, fused_expand_dw, supports)

# (shape, c_exp, stride) — Ce must be lane-clean (%128); heights cover
# multi-tile grids and both backward tile sizes
CASES = [((2, 16, 32, 16), 128, 1), ((2, 16, 32, 16), 128, 2),
         ((1, 8, 64, 24), 256, 1), ((1, 8, 64, 24), 256, 2),
         ((1, 4, 16, 64), 384, 1), ((1, 4, 16, 64), 384, 2),
         ((1, 2, 16, 16), 128, 2)]   # h=2: Ti=2 backward tile

FAST_CASES = [((2, 16, 32, 16), 128, 1), ((1, 8, 64, 24), 256, 2)]


def _make(shape, ce, seed=0):
    rng = np.random.default_rng(seed)
    n, h, w, c = shape
    x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    wt = jnp.asarray(rng.normal(size=(c, ce)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.normal(size=(ce,)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, ce)), jnp.float32)
    return x, wt, b, k


def _check_fwd(shape, ce, stride):
    x, wt, b, k = _make(shape, ce)
    assert supports(shape, ce, stride)
    y = fused_expand_dw(x, wt, b, k, stride, True)
    ref = expand_dw_reference(x, wt, b, k, stride)
    assert y.shape == ref.shape and y.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=5e-2)


def _check_vjp(shape, ce, stride):
    x, wt, b, k = _make(shape, ce)

    def loss(fn, interp):
        def f(x, wt, b, k):
            o = fn(x, wt, b, k, stride, *(
                (interp,) if fn is fused_expand_dw else ()))
            w = jnp.cos(jnp.arange(o.size, dtype=jnp.float32)).reshape(o.shape)
            return jnp.sum(o.astype(jnp.float32) * w)
        return f

    g1 = jax.grad(loss(fused_expand_dw, True), argnums=(0, 1, 2, 3))(
        x, wt, b, k)
    g2 = jax.grad(loss(expand_dw_reference, None), argnums=(0, 1, 2, 3))(
        x, wt, b, k)
    for a, r, name in zip(g1, g2, ["dx", "dw", "db", "dk"]):
        scale = float(jnp.max(jnp.abs(r.astype(jnp.float32)))) + 1e-9
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - r.astype(jnp.float32)))) / scale
        assert err < 2e-2, (name, err)


@pytest.mark.slow
@pytest.mark.parametrize("shape,ce,stride", CASES)
def test_mbconv_forward_matches_xla(shape, ce, stride):
    _check_fwd(shape, ce, stride)


@pytest.mark.slow
@pytest.mark.parametrize("shape,ce,stride", CASES)
def test_mbconv_vjp_matches_xla(shape, ce, stride):
    _check_vjp(shape, ce, stride)


@pytest.mark.parametrize("shape,ce,stride", FAST_CASES)
def test_mbconv_fast_smoke(shape, ce, stride):
    _check_fwd(shape, ce, stride)
    _check_vjp(shape, ce, stride)


def test_supports_gate():
    assert supports((2, 16, 32, 16), 128, 1)
    assert not supports((2, 16, 32, 16), 192, 1)   # Ce not lane-clean
    assert not supports((2, 15, 32, 16), 128, 2)   # odd H at stride 2
    assert not supports((2, 16, 20, 16), 128, 1)   # W not sublane-clean
    assert not supports((2, 16, 32, 16), 128, 3)   # unsupported stride
    # FastSCNN stage-2 tail blocks (Ce=576) stay on XLA
    assert not supports((2, 64, 128, 96), 576, 1)


@pytest.mark.slow
def test_remat_step_suppresses_routing(monkeypatch):
    """make_train_step(remat=True) must not route through the fused
    kernel (its forward would run twice under rematerialisation;
    measured 8% slower at the crop remat tier)."""
    import optax
    from flax import nnx

    from torch_semantic_segmentation_tpu import train as train_mod
    from torch_semantic_segmentation_tpu.ops import blocks as blocks_mod
    from torch_semantic_segmentation_tpu.ops import pallas_mbconv

    monkeypatch.setenv("TPU_SEG_PALLAS_MBCONV", "1")
    monkeypatch.setenv("TPU_SEG_PALLAS_MBCONV_MIN_PX", "0")
    # the route folds the expand BN, so it honors folded_bn's kill
    # switch too (blocks.InvertedResidual); force it on off-TPU
    monkeypatch.setenv("TPU_SEG_FOLDED_BN", "1")
    calls = []
    real = pallas_mbconv.fused_expand_dw

    def spy(x, w, b, k, stride, interpret=False):
        calls.append(stride)
        return real(x, w, b, k, stride, True)

    monkeypatch.setattr(pallas_mbconv, "fused_expand_dw", spy)

    class Tiny(nnx.Module):
        def __init__(self, rngs):
            self.blk = blocks_mod.InvertedResidual(
                16, 16, stride=1, expand_ratio=8, dtype=jnp.bfloat16,
                rngs=rngs)

        def __call__(self, x):
            return self.blk(x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 16)), jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, 16, size=(2, 8, 16)), jnp.int32)

    for remat, expect_routed in ((True, False), (False, True)):
        calls.clear()
        model = Tiny(nnx.Rngs(0))
        model.train()
        gd, params, rest = nnx.split(model, nnx.Param, ...)
        state = train_mod.TrainState(
            params=params, rest=rest,
            opt_state=optax.sgd(0.1).init(params), step=jnp.int32(0))
        step = train_mod.make_train_step(gd, optax.sgd(0.1), jit=False,
                                         remat=remat)
        step(state, x, y)
        assert bool(calls) == expect_routed, (remat, calls)


def test_inverted_residual_routes_and_matches(monkeypatch):
    """Block-level equivalence: routed (kernel, interpret) vs standard.
    Routing is TPU-gated in enabled(); force it on and patch the kernel
    to interpret mode for the CPU tier."""
    from flax import nnx

    from torch_semantic_segmentation_tpu.ops import blocks as blocks_mod
    from torch_semantic_segmentation_tpu.ops import pallas_mbconv

    monkeypatch.setenv("TPU_SEG_PALLAS_MBCONV", "1")
    monkeypatch.setenv("TPU_SEG_PALLAS_MBCONV_MIN_PX", "0")
    monkeypatch.setenv("TPU_SEG_FOLDED_BN", "1")
    real = pallas_mbconv.fused_expand_dw
    calls = []

    def interp_kernel(x, w, b, k, stride, interpret=False):
        calls.append(stride)
        return real(x, w, b, k, stride, True)

    monkeypatch.setattr(pallas_mbconv, "fused_expand_dw", interp_kernel)

    for stride in (1, 2):
        blk = blocks_mod.InvertedResidual(
            16, 16 if stride == 1 else 24, stride=stride, expand_ratio=8,
            dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
        blk.train()
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 16, 32, 16)), jnp.bfloat16)
        y_routed = blk(x)
        assert calls and calls[-1] == stride

        monkeypatch.setenv("TPU_SEG_PALLAS_MBCONV", "0")
        blk0 = blocks_mod.InvertedResidual(
            16, 16 if stride == 1 else 24, stride=stride, expand_ratio=8,
            dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
        blk0.train()
        y_std = blk0(x)
        monkeypatch.setenv("TPU_SEG_PALLAS_MBCONV", "1")

        np.testing.assert_allclose(np.asarray(y_routed, np.float32),
                                   np.asarray(y_std, np.float32),
                                   rtol=5e-2, atol=1e-1)
        # BN running stats advanced identically through the fold
        np.testing.assert_allclose(
            np.asarray(blk.dw.bn.mean[...], np.float32),
            np.asarray(blk0.dw.bn.mean[...], np.float32),
            rtol=1e-2, atol=1e-3)
