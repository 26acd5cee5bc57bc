"""Training-time 1×1-conv BN folding (ops/folded_bn.py): numeric parity
with the standard conv→BN→act path (forward, gradients, running stats)
and GSPMD sync-BN equality on the fake 8-device mesh.

The fold recomputes BatchNorm's batch statistics from the conv INPUT's
first/second moments instead of reducing the (6×-wider) conv output —
same fast-variance math, different float association — so parity is
tight-tolerance, not bitwise (SURVEY.md §2.2 "BatchNorm" row;
docs/FULLRES_ROOFLINE.md round-3 addendum for the byte accounting)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

from torch_semantic_segmentation_tpu.ops import folded_bn
from torch_semantic_segmentation_tpu.ops.conv import ConvBNAct


def _run(fold: bool, *, act="relu", use_conv_bias=False, c_in=16, c_out=96,
         x=None, seed=0):
    """One training-mode ConvBNAct fwd+grad with the fold forced on/off.
    Returns (loss, y, grads-leaves, running_mean, running_var)."""
    os.environ["TPU_SEG_FOLDED_BN"] = "1" if fold else "0"
    try:
        m = ConvBNAct(c_in, c_out, 1, act=act, use_bias=use_conv_bias,
                      rngs=nnx.Rngs(seed))
        m.train()

        def compute(model):
            y = model(x)
            return jnp.sum(y ** 2), y

        (loss, y), grads = nnx.value_and_grad(compute, has_aux=True)(m)
        return (loss, y, jax.tree.leaves(grads),
                np.array(m.bn.mean[...]), np.array(m.bn.var[...]))
    finally:
        os.environ.pop("TPU_SEG_FOLDED_BN", None)


@pytest.mark.parametrize("act,use_conv_bias",
                         [("relu", False), (None, True)])
def test_folded_matches_standard_fp32(act, use_conv_bias):
    """fp32 CPU: forward, every gradient leaf, and the running-stat
    update agree with the standard path to reassociation noise."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 10, 16)), jnp.float32)
    l0, y0, g0, rm0, rv0 = _run(False, act=act, use_conv_bias=use_conv_bias, x=x)
    l1, y1, g1, rm1, rv1 = _run(True, act=act, use_conv_bias=use_conv_bias, x=x)
    assert abs(float(l1 - l0)) <= 1e-5 * abs(float(l0))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(g0, g1):
        # atol floor 5e-4: the conv-bias gradient is mathematically
        # exactly 0 (BN's μ cancels the bias) — the fold emits exact 0,
        # the standard path ~1e-4 roundoff; noise compared against noise
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=max(1e-5 * scale, 5e-4))
    np.testing.assert_allclose(rm1, rm0, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(rv1, rv0, rtol=1e-5, atol=1e-7)


def test_routing_predicate():
    """Only clear byte winners route: C_out ≥ 3·C_in (measured —
    same-width pointwise folds LOSE bytes, see folded_bn.fold_wins)."""
    assert folded_bn.fold_wins(64, 384)       # inverted-residual expand
    assert folded_bn.fold_wins(128, 768)
    assert not folded_bn.fold_wins(128, 128)  # classifier pointwise
    assert not folded_bn.fold_wins(384, 64)   # project
    assert not folded_bn.fold_wins(256, 128)  # PPM fuse


def test_eval_mode_never_routes():
    """use_running_average=True must take the standard (foldable-at-
    serving-time) path: the moment identity is a training-stats device."""
    os.environ["TPU_SEG_FOLDED_BN"] = "1"
    try:
        m = ConvBNAct(16, 96, 1, act="relu", rngs=nnx.Rngs(0))
        m.eval()
        x = jnp.zeros((1, 4, 4, 16), jnp.float32)
        assert m._maybe_folded_train_1x1(x) is None
        y = m(x)                                 # and the call still works
        assert y.shape == (1, 4, 4, 96)
    finally:
        os.environ.pop("TPU_SEG_FOLDED_BN", None)


@pytest.mark.slow
def test_folded_bn_dp8_matches_single_device():
    """Sync-BN through the fold: the moment reductions must reduce over
    the GLOBAL sharded batch (XLA all-reduce), so a DP-8 step equals the
    single-device big-batch step — same contract as the standard BN path
    (test_parallel.test_dp8_loss_and_params_match_single_device)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from torch_semantic_segmentation_tpu.parallel import (
        data_parallel_mesh, replicate)
    assert jax.device_count() == 8
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 8, 8, 16)), jnp.float32)

    os.environ["TPU_SEG_FOLDED_BN"] = "1"
    try:
        m = ConvBNAct(16, 96, 1, act="relu", rngs=nnx.Rngs(0))
        m.train()
        gd, params, rest = nnx.split(m, nnx.Param, ...)

        @jax.jit
        def step(params, rest, x):
            mm = nnx.merge(gd, params, rest)
            mm.train()

            def compute(model):
                return jnp.mean(model(x) ** 2)

            loss, grads = nnx.value_and_grad(compute)(mm)
            _, _, new_rest = nnx.split(mm, nnx.Param, ...)
            return loss, grads, new_rest

        ref_loss, ref_grads, ref_rest = step(params, rest, x)

        mesh = data_parallel_mesh()
        dp_params, dp_rest = replicate((params, rest), mesh)
        dp_x = jax.device_put(x, NamedSharding(mesh, P(("data",))))
        dp_loss, dp_grads, dp_rest_out = step(dp_params, dp_rest, dp_x)

        np.testing.assert_allclose(float(dp_loss), float(ref_loss), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(dp_grads)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree.leaves(ref_rest), jax.tree.leaves(dp_rest_out)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-7)
    finally:
        os.environ.pop("TPU_SEG_FOLDED_BN", None)
