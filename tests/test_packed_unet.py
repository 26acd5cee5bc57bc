"""UNet full-res packed rim: routed vs standard path parity.

The packed rim (ops/packed_unet.py) must produce the SAME logits, loss
gradients, and BN running-stat updates as the plain NHWC path up to
float reassociation — it is a layout strategy, not a different model
(SURVEY.md §2.1 "UNet", BASELINE.json config 3; the reference's decoder
is ordinary cuDNN ConvTranspose2d + concat convs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from torch_semantic_segmentation_tpu.losses import cross_entropy_loss
from torch_semantic_segmentation_tpu.models import get_model
from torch_semantic_segmentation_tpu.ops.packed_ops import PackedLogits

VAR = "TPU_SEG_PACKED_UNET_BODY"


def test_packed_rim_forward_parity(monkeypatch):
    """Forced routing (eval mode): enc1/up1/head all packed — matches
    the plain path up to reassociation."""
    monkeypatch.setenv(VAR, "1")
    m = get_model("unet", num_classes=19, rngs=nnx.Rngs(0))
    m.eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 64, 3), jnp.float32)
    out_p = m(x)
    assert isinstance(out_p, PackedLogits), "env=1 must force rim routing"
    assert out_p.shape == (1, 32, 64, 19)
    monkeypatch.setenv(VAR, "0")
    out_ref = m(x)
    assert isinstance(out_ref, jax.Array)
    np.testing.assert_allclose(out_p.unpack(), out_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_packed_rim_train_grad_and_stats_parity(monkeypatch):
    # slow-tier since round 5 (VERDICT r4 next #7): the f64 grad-parity
    # class keeps test_packed_enet.py's as the one fast representative;
    # the rim's forward parity stays fast above.
    """TRAIN-mode parity in float64 (reassociation-exact): loss, every
    parameter gradient, and the updated BN running stats match the
    plain path."""
    import os

    jax.config.update("jax_enable_x64", True)
    try:
        m = get_model("unet", num_classes=7, base_ch=8,
                      rngs=nnx.Rngs(0), param_dtype=jnp.float64)
        m.train()
        gd, state = nnx.split(m)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3),
                              jnp.float64)
        labels = jax.random.randint(jax.random.PRNGKey(2), (2, 32, 32), 0, 7)
        labels = labels.at[0, :4].set(255)

        def loss_of(state, packed):
            os.environ[VAR] = "1" if packed else "0"
            model = nnx.merge(gd, state)
            return cross_entropy_loss(model(x), labels)

        try:
            lp, gp = jax.value_and_grad(loss_of, allow_int=True)(state, True)
            lr, gr = jax.value_and_grad(loss_of, allow_int=True)(state, False)
        finally:
            os.environ.pop(VAR, None)
        # the loss's internal fp32 cast bounds agreement at ~1e-7 rel
        np.testing.assert_allclose(float(lp), float(lr), rtol=1e-6)
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
    m1 = get_model("unet", num_classes=7, base_ch=8, rngs=nnx.Rngs(0))
    m2 = get_model("unet", num_classes=7, base_ch=8, rngs=nnx.Rngs(0))
    m1.train(), m2.train()
    x32 = jnp.asarray(np.random.default_rng(5).normal(size=(2, 32, 32, 3)),
                      jnp.float32)
    monkeypatch.setenv(VAR, "1")
    assert isinstance(m1(x32), PackedLogits)
    monkeypatch.setenv(VAR, "0")
    m2(x32)
    for a, b in zip(jax.tree_util.tree_leaves(nnx.state(m1, nnx.BatchStat)),
                    jax.tree_util.tree_leaves(nnx.state(m2, nnx.BatchStat))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_bilinear_variant_keeps_standard_path(monkeypatch):
    """The bilinear decoder routes the fused Pallas upsample+concat
    design instead — supports() must refuse the packed rim."""
    from torch_semantic_segmentation_tpu.ops import packed_unet

    monkeypatch.setenv(VAR, "1")
    m = get_model("unet", num_classes=19, upsample="bilinear",
                  rngs=nnx.Rngs(0))
    m.eval()
    x = jnp.zeros((1, 32, 64, 3), jnp.float32)
    assert packed_unet.supports(m, x.shape) is False
    out = m(x)
    assert isinstance(out, jax.Array) and out.shape == (1, 32, 64, 19)


def test_unsupported_width_falls_back(monkeypatch):
    """W with no lane-clean head pack (W=48: 48 % 32 != 0 at p=32 and
    48 % 16 == 0 gives 304 lanes — wait, p=16 fits 48? 48 % 16 == 0 →
    pick_head_pack CAN return 16) — use W=80 where only p=8/16 divide
    and both fit: the rim still routes. True fallback: W % 2 != 0 is
    impossible under the model's %16 assert, so exercise num_classes
    large enough that no pack fits the lane budget."""
    monkeypatch.setenv(VAR, "1")
    m = get_model("unet", num_classes=200, rngs=nnx.Rngs(0))
    m.eval()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    out = m(x)
    assert isinstance(out, jax.Array) and out.shape == (1, 32, 32, 200)
