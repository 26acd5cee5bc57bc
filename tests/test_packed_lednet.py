"""LEDNet whole-encoder packed body: routed vs standard parity.

The packed encoder (ops/packed_lednet.py) must produce the SAME logits,
loss gradients, BN running-stat updates, and dropout masks as the plain
NHWC path up to float reassociation — it is a layout strategy, not a
different model (SURVEY.md §2.1 stretch row; the reference's blocks are
ordinary cuDNN NCHW convs + torch channel_shuffle). Same proof shape as
tests/test_packed_erf.py (f64 gradient compare; see its docstring for
the tolerance calibration)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from torch_semantic_segmentation_tpu.losses import cross_entropy_loss
from torch_semantic_segmentation_tpu.models import get_model

BODY = "TPU_SEG_PACKED_LEDNET_BODY"
HEAD = "TPU_SEG_PACKED_LEDNET"


def test_packed_encoder_forward_parity(monkeypatch):
    """Forced encoder routing (eval mode): downsamplers and all SS-nbt
    stages (split / factorized dilated convs / shuffle as selection
    matmuls) packed — matches the plain path up to reassociation."""
    monkeypatch.setenv(HEAD, "0")
    m = get_model("lednet", num_classes=19, rngs=nnx.Rngs(0))
    m.eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 64, 3), jnp.float32)
    monkeypatch.setenv(BODY, "1")
    # routing must actually take (eval-mode: route_packed_head is
    # train-gated, so force via env)
    from torch_semantic_segmentation_tpu.ops import packed_lednet

    assert packed_lednet.supports(m, x.shape)
    out_p = m(x)
    monkeypatch.setenv(BODY, "0")
    out_ref = m(x)
    assert out_p.shape == out_ref.shape == (1, 32, 64, 19)
    np.testing.assert_allclose(out_p, out_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_packed_encoder_train_grad_stats_dropout_parity(monkeypatch):
    """TRAIN-mode parity in f64 (slow tier — VERDICT r4 next #7: the
    f64 grad-parity class keeps test_packed_enet.py's as the one fast
    representative; LEDNet's forward/BN-stat parity stays fast above):
    loss, every parameter gradient, and
    the updated BN running stats match the plain path with per-element
    dropout ACTIVE (threefry masks are reshape-invariant, so the packed
    draw is the identical logical mask)."""
    jax.config.update("jax_enable_x64", True)
    try:
        m = get_model("lednet", num_classes=19, param_dtype=jnp.float64,
                      rngs=nnx.Rngs(0))
        m.train()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 64, 3),
                              jnp.float64)
        labels = jax.random.randint(jax.random.PRNGKey(2), (2, 32, 64), 0, 19)
        labels = labels.at[0, 0].set(255)
        gd, state = nnx.split(m)

        def loss_of(state, packed):
            os.environ[BODY] = "1" if packed else "0"
            os.environ[HEAD] = "0"
            model = nnx.merge(gd, state)
            return cross_entropy_loss(model(x), labels)

        try:
            lp, gp = jax.value_and_grad(loss_of, allow_int=True)(state, True)
            lr, gr = jax.value_and_grad(loss_of, allow_int=True)(state, False)
        finally:
            os.environ.pop(BODY, None)
            os.environ.pop(HEAD, None)
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
    m1 = get_model("lednet", num_classes=19, rngs=nnx.Rngs(0))
    m2 = get_model("lednet", num_classes=19, rngs=nnx.Rngs(0))
    m1.train(), m2.train()
    monkeypatch.setenv(HEAD, "0")
    monkeypatch.setenv(BODY, "1")
    m1(x)
    monkeypatch.setenv(BODY, "0")
    m2(x)
    for a, b in zip(jax.tree_util.tree_leaves(nnx.state(m1, nnx.BatchStat)),
                    jax.tree_util.tree_leaves(nnx.state(m2, nnx.BatchStat))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_supports_rejects_unknown_block(monkeypatch):
    """Block-vocabulary guard: a model variant with a block the packed
    walker doesn't know falls back to the standard path from supports()
    instead of raising mid-forward."""
    from torch_semantic_segmentation_tpu.ops import packed_lednet

    monkeypatch.setenv(BODY, "1")
    monkeypatch.setenv(HEAD, "0")
    m = get_model("lednet", num_classes=19, rngs=nnx.Rngs(0))
    m.eval()

    class Foreign(nnx.Module):
        def __init__(self, inner):
            self.inner = inner

        def __call__(self, x):
            return self.inner(x)

    m.encoder[1] = Foreign(m.encoder[1])
    x = jnp.zeros((1, 16, 32, 3), jnp.float32)
    assert packed_lednet.supports(m, x.shape) is False
    out = m(x)       # plain path, no TypeError
    assert isinstance(out, jax.Array) and out.shape == (1, 16, 32, 19)
