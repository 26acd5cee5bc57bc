"""ERFNet/ESNet whole-network packed body: routed vs standard parity.

The packed body (ops/packed_erf.py) must produce the SAME logits, loss
gradients, BN running-stat updates, and dropout masks as the plain
NHWC path up to float reassociation — it is a layout strategy, not a
different model (SURVEY.md §2.1 stretch rows; the reference's blocks
are ordinary cuDNN NCHW convs)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from torch_semantic_segmentation_tpu.losses import cross_entropy_loss
from torch_semantic_segmentation_tpu.models import get_model
from torch_semantic_segmentation_tpu.ops.packed_ops import PackedLogits

MODELS = ["erfnet", "esnet"]


def _vars(name):
    return (f"TPU_SEG_PACKED_{name.upper()}_BODY",
            f"TPU_SEG_PACKED_{name.upper()}")


@pytest.mark.parametrize("name", MODELS)
def test_packed_body_forward_parity(name, monkeypatch):
    """Forced body routing (eval mode): downsamplers, factorized units,
    upsamplers and the output deconv all packed — matches the plain
    path up to reassociation."""
    body, head = _vars(name)
    monkeypatch.setenv(body, "1")
    m = get_model(name, num_classes=19, rngs=nnx.Rngs(0))
    m.eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 64, 3), jnp.float32)
    out_p = m(x)
    assert isinstance(out_p, PackedLogits), "env=1 must force body routing"
    monkeypatch.setenv(body, "0")
    monkeypatch.setenv(head, "0")
    out_ref = m(x)
    assert isinstance(out_ref, jax.Array)
    assert out_p.shape == out_ref.shape
    np.testing.assert_allclose(out_p.unpack(), out_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("name", MODELS)
def test_packed_body_train_grad_stats_dropout_parity(name, monkeypatch):
    # slow-tier since round 5 (VERDICT r4 next #7): the f64 grad-parity
    # class keeps ONE fast representative — test_packed_enet.py's —
    # while this family's forward/BN-stat parity stays fast above.
    """TRAIN-mode parity: loss, every parameter gradient, and the
    updated BN running stats match the plain path with per-element
    dropout ACTIVE — the packed dropout consumes the same RNG keys and,
    because `pack` is a pure reshape, draws the identical logical mask
    bits in packed layout.

    The gradient comparison runs in float64: the transform is exact up
    to reassociation, and in fp32 that reassociation noise amplifies
    backward through ~20 BN-over-batch-stat layers to ~2% of the max
    encoder kernel-grad magnitude (measured: plain-fp32 sits the same
    distance from a float64 reference as packed-fp32 does — both are
    reassociation noise, not a defect). In f64 the measured packed-vs-
    plain gap is ≤7e-8 (limited by the loss's internal fp32 cast), vs
    O(1e-2) for any real routing/mask/stat bug."""
    body, head = _vars(name)
    jax.config.update("jax_enable_x64", True)
    try:
        m = get_model(name, num_classes=19, param_dtype=jnp.float64,
                      rngs=nnx.Rngs(0))
        m.train()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 64, 3),
                              jnp.float64)
        labels = jax.random.randint(jax.random.PRNGKey(2), (2, 32, 64), 0, 19)
        labels = labels.at[0, 0].set(255)
        gd, state = nnx.split(m)

        def loss_of(state, packed):
            os.environ[body] = "1" if packed else "0"
            if not packed:
                os.environ[head] = "0"
            model = nnx.merge(gd, state)
            return cross_entropy_loss(model(x), labels)

        try:
            lp, gp = jax.value_and_grad(loss_of, allow_int=True)(state, True)
            lr, gr = jax.value_and_grad(loss_of, allow_int=True)(state, False)
        finally:
            os.environ.pop(body, None)
            os.environ.pop(head, None)
        np.testing.assert_allclose(lp, lr, rtol=1e-5, atol=1e-6)
        ref = jax.tree.leaves_with_path(gr)
        got = dict(jax.tree.leaves_with_path(gp))
        assert ref
        for path, leaf in ref:
            if not jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.inexact):
                continue
            np.testing.assert_allclose(
                got[path], leaf, rtol=1e-6, atol=5e-7,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
    finally:
        jax.config.update("jax_enable_x64", False)

    # BN running stats after one train-mode forward each (fp32)
    m1 = get_model(name, num_classes=19, rngs=nnx.Rngs(0))
    m2 = get_model(name, num_classes=19, rngs=nnx.Rngs(0))
    m1.train(), m2.train()
    monkeypatch.setenv(body, "1")
    m1(x)
    monkeypatch.setenv(body, "0")
    monkeypatch.setenv(head, "0")
    m2(x)
    for a, b in zip(jax.tree_util.tree_leaves(nnx.state(m1, nnx.BatchStat)),
                    jax.tree_util.tree_leaves(nnx.state(m2, nnx.BatchStat))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", MODELS)
def test_packed_body_unsupported_width_falls_back(name, monkeypatch):
    """W % 16 != 0 (but % 8 == 0, model-legal): the body must not
    route; with the head also off the plain path runs."""
    body, head = _vars(name)
    monkeypatch.setenv(body, "1")
    monkeypatch.setenv(head, "0")
    m = get_model(name, num_classes=19, rngs=nnx.Rngs(0))
    m.eval()
    x = jnp.zeros((1, 16, 24, 3), jnp.float32)
    out = m(x)
    assert isinstance(out, jax.Array) and out.shape == (1, 16, 24, 19)


def test_supports_rejects_unknown_block(monkeypatch):
    """Block-vocabulary guard (ADVICE r3): a model variant with a block
    type the packed walker doesn't know must fall back to the standard
    path from supports() instead of raising TypeError mid-forward."""
    from torch_semantic_segmentation_tpu.ops import packed_erf

    body, head = _vars("erfnet")
    monkeypatch.setenv(body, "1")
    monkeypatch.setenv(head, "0")
    m = get_model("erfnet", num_classes=19, rngs=nnx.Rngs(0))
    m.eval()

    class Foreign(nnx.Module):
        """Unrecognized block type wrapping the real block (same math,
        unknown to the packed walker's vocabulary)."""

        def __init__(self, inner):
            self.inner = inner

        def __call__(self, x):
            return self.inner(x)

    m.encoder[1] = Foreign(m.encoder[1])
    x = jnp.zeros((1, 16, 32, 3), jnp.float32)
    assert packed_erf.supports(m, x.shape) is False
    out = m(x)       # plain path, no TypeError
    assert isinstance(out, jax.Array) and out.shape == (1, 16, 32, 19)
