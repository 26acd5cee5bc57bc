"""ENet packed full-res head: routed vs standard path parity.

The packed head (models/enet.py `_packed_head`) must produce the SAME
logits and loss gradients as the plain `fullconv` path up to float
reassociation — it is a layout strategy, not a different model
(SURVEY.md §2.1 "ENet"; the reference's final layer is an ordinary
ConvTranspose2d whose outputs feed F.cross_entropy).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from torch_semantic_segmentation_tpu.losses import cross_entropy_loss
from torch_semantic_segmentation_tpu.models.enet import enet
from torch_semantic_segmentation_tpu.ops.packed_ops import PackedLogits


@pytest.fixture
def env_packed(monkeypatch):
    monkeypatch.setenv("TPU_SEG_PACKED_ENET", "1")


def _model():
    m = enet(num_classes=19, rngs=nnx.Rngs(0))
    m.eval()   # deterministic dropout + running BN: bit-stable reruns
    return m


def test_packed_head_routes_and_matches(env_packed, monkeypatch):
    m = _model()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 64, 3), jnp.float32)
    out_p = m(x)
    assert isinstance(out_p, PackedLogits), "env=1 must force routing"
    monkeypatch.setenv("TPU_SEG_PACKED_ENET", "0")
    out_ref = m(x)
    assert isinstance(out_ref, jax.Array)
    assert out_p.shape == out_ref.shape
    np.testing.assert_allclose(out_p.unpack(), out_ref, rtol=1e-4, atol=1e-4)


def test_packed_head_loss_and_grad_parity(env_packed, monkeypatch):
    m = _model()
    gd, params, rest = nnx.split(m, nnx.Param, ...)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 32, 3), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(2), (1, 16, 32), 0, 19)
    labels = labels.at[0, 0].set(255)

    def loss_of(params):
        model = nnx.merge(gd, params, rest)
        return cross_entropy_loss(model(x), labels)

    lp, gp = jax.value_and_grad(loss_of)(params)
    os.environ["TPU_SEG_PACKED_ENET"] = "0"
    try:
        lr, gr = jax.value_and_grad(loss_of)(params)
    finally:
        os.environ["TPU_SEG_PACKED_ENET"] = "1"
    np.testing.assert_allclose(lp, lr, rtol=1e-5, atol=1e-6)
    flat_p = jax.tree_util.tree_leaves(gp)
    flat_r = jax.tree_util.tree_leaves(gr)
    for a, b in zip(flat_p, flat_r):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_packed_head_off_in_eval_mode_by_default(monkeypatch):
    # unset env: routing gates on backend (cpu here → off) AND train mode
    monkeypatch.delenv("TPU_SEG_PACKED_ENET", raising=False)
    monkeypatch.setenv("TPU_SEG_PACKED", "0")
    m = _model()
    x = jnp.zeros((1, 16, 32, 3), jnp.float32)
    assert isinstance(m(x), jax.Array)


@pytest.mark.parametrize("name", ["erfnet", "esnet"])
def test_packed_head_erfnet_esnet_parity(name, monkeypatch):
    """ERFNet/ESNet route the same shared packed head
    (packed_ops.apply_packed_deconv_head) on their k2/s2 output deconv;
    forward + loss-grad parity vs the plain path."""
    from torch_semantic_segmentation_tpu.models import get_model

    var = f"TPU_SEG_PACKED_{name.upper()}"
    monkeypatch.setenv(var, "1")
    m = get_model(name, num_classes=19, rngs=nnx.Rngs(0))
    m.eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32, 3), jnp.float32)
    out_p = m(x)
    assert isinstance(out_p, PackedLogits), "env=1 must force routing"
    monkeypatch.setenv(var, "0")
    out_ref = m(x)
    assert out_p.shape == out_ref.shape
    np.testing.assert_allclose(out_p.unpack(), out_ref, rtol=1e-4, atol=1e-4)

    monkeypatch.setenv(var, "1")
    gd, params, rest = nnx.split(m, nnx.Param, ...)
    labels = jax.random.randint(jax.random.PRNGKey(2), (1, 16, 32), 0, 19)
    labels = labels.at[0, 0].set(255)

    def loss_of(params):
        model = nnx.merge(gd, params, rest)
        return cross_entropy_loss(model(x), labels)

    lp, gp = jax.value_and_grad(loss_of)(params)
    monkeypatch.setenv(var, "0")
    lr, gr = jax.value_and_grad(loss_of)(params)
    np.testing.assert_allclose(lp, lr, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


@pytest.mark.parametrize("w", [24, 40, 56, 64])
def test_packed_head_any_valid_width(env_packed, w):
    """Every ENet-legal width (W % 8 == 0) has a legal pack: the head
    input is W/2, a multiple of 4 — the p=8 window step — so routing
    never needs a fallback, only a per-width pack choice."""
    m = _model()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, w, 3), jnp.float32)
    out = m(x)
    assert isinstance(out, PackedLogits)
    assert out.shape == (1, 16, w, 19)
    os.environ["TPU_SEG_PACKED_ENET"] = "0"
    try:
        ref = m(x)
    finally:
        os.environ["TPU_SEG_PACKED_ENET"] = "1"
    np.testing.assert_allclose(out.unpack(), ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# whole-network packed body (ops/packed_enet.py)


def test_packed_body_forward_parity(monkeypatch):
    """Forced body routing (eval mode): the fully-packed forward —
    InitialBlock, down/regular/up bottlenecks with packed index
    forwarding, final deconv — matches the plain path bit-for-bit up to
    reassociation."""
    monkeypatch.setenv("TPU_SEG_PACKED_ENET_BODY", "1")
    m = _model()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 64, 3), jnp.float32)
    out_p = m(x)
    assert isinstance(out_p, PackedLogits), "env=1 must force body routing"
    monkeypatch.setenv("TPU_SEG_PACKED_ENET_BODY", "0")
    monkeypatch.setenv("TPU_SEG_PACKED_ENET", "0")
    out_ref = m(x)
    assert out_p.shape == out_ref.shape
    np.testing.assert_allclose(out_p.unpack(), out_ref, rtol=1e-4, atol=1e-5)


def test_packed_body_train_grad_stats_dropout_parity(monkeypatch):
    """TRAIN-mode parity of the packed body: loss, every parameter
    gradient, and the updated BN running stats match the plain path
    with spatial dropout ACTIVE — the packed dropout must consume the
    same RNG stream and draw the identical logical (N,1,1,C) mask."""
    m = enet(num_classes=19, rngs=nnx.Rngs(0))
    m.train()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 64, 3), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(2), (2, 32, 64), 0, 19)
    labels = labels.at[0, 0].set(255)
    gd, state = nnx.split(m)

    def loss_of(state, packed):
        os.environ["TPU_SEG_PACKED_ENET_BODY"] = "1" if packed else "0"
        if not packed:
            os.environ["TPU_SEG_PACKED_ENET"] = "0"
        model = nnx.merge(gd, state)
        return cross_entropy_loss(model(x), labels)

    try:
        lp, gp = jax.value_and_grad(loss_of, allow_int=True)(state, True)
        lr, gr = jax.value_and_grad(loss_of, allow_int=True)(state, False)
    finally:
        os.environ.pop("TPU_SEG_PACKED_ENET_BODY", None)
        os.environ.pop("TPU_SEG_PACKED_ENET", None)
    np.testing.assert_allclose(lp, lr, rtol=1e-5, atol=1e-6)
    ref = jax.tree.leaves_with_path(gr)
    got = dict(jax.tree.leaves_with_path(gp))
    assert ref
    for path, leaf in ref:
        if not jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.inexact):
            continue
        np.testing.assert_allclose(
            got[path], leaf, rtol=2e-3, atol=2e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")

    # BN running stats after one train-mode forward each
    m1 = enet(num_classes=19, rngs=nnx.Rngs(0))
    m2 = enet(num_classes=19, rngs=nnx.Rngs(0))
    m1.train(), m2.train()
    monkeypatch.setenv("TPU_SEG_PACKED_ENET_BODY", "1")
    m1(x)
    monkeypatch.setenv("TPU_SEG_PACKED_ENET_BODY", "0")
    monkeypatch.setenv("TPU_SEG_PACKED_ENET", "0")
    m2(x)
    for a, b in zip(jax.tree_util.tree_leaves(nnx.state(m1, nnx.BatchStat)),
                    jax.tree_util.tree_leaves(nnx.state(m2, nnx.BatchStat))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_packed_body_unsupported_width_falls_back(monkeypatch):
    """W % 16 != 0 (but % 8 == 0, model-legal): the body must not route;
    the packed HEAD still can (its window step is W/2 % 4)."""
    monkeypatch.setenv("TPU_SEG_PACKED_ENET_BODY", "1")
    monkeypatch.setenv("TPU_SEG_PACKED_ENET", "0")
    m = _model()
    x = jnp.zeros((1, 16, 24, 3), jnp.float32)
    out = m(x)
    assert isinstance(out, jax.Array) and out.shape == (1, 16, 24, 19)
