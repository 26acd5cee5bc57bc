"""Packed resize head: routed vs standard path parity across the zoo.

Every model whose final layer is `resize_bilinear(logits, (H, W))`
(LEDNet APN, BiSeNet incl. aux heads, ContextNet, DeepLab, ICNet,
FastSCNN) can emit the full-res logits W-packed instead
(packed_ops.apply_packed_resize_head) — same bilinear math (same
interpolation matrices, same contractions), just never materializing
the 6.7×-lane-padded (…, C=19) full-res tensor. Reference counterpart:
torch F.interpolate on NCHW logits (SURVEY.md §2.2 "Bilinear
upsample"); the packed layout is purely a TPU lane strategy."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from torch_semantic_segmentation_tpu.losses import (
    aux_weighted_loss, cross_entropy_loss)
from torch_semantic_segmentation_tpu.models import get_model
from torch_semantic_segmentation_tpu.ops.packed_ops import PackedLogits

# (registry name, env var, #full-res outputs when routed).
# Round-5 tier management (VERDICT r4 next #7): the resize heads are
# RETIRED dead-end infrastructure (measured losses in every context —
# packed_ops.maybe_packed_resize docstring), so only ONE representative
# parity permutation (fastscnn) stays in the fast tier; the other five
# run in the slow tier (the env-forced path they pin is unreachable
# without the env var).
_slow = pytest.mark.slow
CASES = [
    pytest.param("lednet", "TPU_SEG_PACKED_LEDNET", 1, marks=_slow),
    pytest.param("bisenet", "TPU_SEG_PACKED_BISENET", 3, marks=_slow),
    pytest.param("contextnet", "TPU_SEG_PACKED_CONTEXTNET", 1,
                 marks=_slow),
    pytest.param("deeplabv3_resnet18", "TPU_SEG_PACKED_DEEPLAB", 1,
                 marks=_slow),
    pytest.param("icnet", "TPU_SEG_PACKED_ICNET", 1, marks=_slow),
    ("fastscnn", "TPU_SEG_PACKED_FASTSCNN", 1),
]


def _outputs(out):
    return list(out) if isinstance(out, (tuple, list)) else [out]


@pytest.mark.parametrize("name,var,n_packed", CASES)
def test_packed_resize_head_parity(name, var, n_packed, monkeypatch):
    """Forced routing (eval mode): every full-res output is PackedLogits
    and matches the plain resize path; loss + parameter gradients match
    within reassociation tolerance (the packed region is only the head,
    so fp32 noise does not amplify through BN chains — same tolerances
    as the ENet packed-head tests)."""
    monkeypatch.setenv(var, "1")
    m = get_model(name, num_classes=19, rngs=nnx.Rngs(0))
    m.eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 64, 3), jnp.float32)
    out_p = _outputs(m(x))
    packed = [o for o in out_p if isinstance(o, PackedLogits)]
    assert len(packed) == n_packed, "env=1 must force head routing"
    assert isinstance(out_p[0], PackedLogits)
    assert out_p[0].shape == (1, 32, 64, 19)

    monkeypatch.setenv(var, "0")
    out_ref = _outputs(m(x))
    for op, orf in zip(out_p, out_ref):
        a = op.unpack() if isinstance(op, PackedLogits) else op
        np.testing.assert_allclose(a, orf, rtol=1e-4, atol=1e-4)

    monkeypatch.setenv(var, "1")
    gd, params, rest = nnx.split(m, nnx.Param, ...)
    labels = jax.random.randint(jax.random.PRNGKey(2), (1, 32, 64), 0, 19)
    labels = labels.at[0, 0].set(255)

    def loss_of(params):
        model = nnx.merge(gd, params, rest)
        out = model(x)
        if isinstance(out, (tuple, list)):
            return aux_weighted_loss(out, labels)
        return cross_entropy_loss(out, labels)

    lp, gp = jax.value_and_grad(loss_of)(params)
    monkeypatch.setenv(var, "0")
    lr, gr = jax.value_and_grad(loss_of)(params)
    np.testing.assert_allclose(lp, lr, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_bn_free_model_routing(monkeypatch):
    """module_train_mode's explicit contract (VERDICT r3 weak #3): a
    model declaring `use_running_average` routes by that flag even with
    no BatchNorm anywhere; nnx train()/eval() flips the flag."""
    from torch_semantic_segmentation_tpu.ops import packed_ops

    class BnFree(nnx.Module):
        def __init__(self, *, rngs: nnx.Rngs):
            self.use_running_average = False
            self.conv = nnx.Conv(3, 19, (1, 1), rngs=rngs)

    m = BnFree(rngs=nnx.Rngs(0))
    assert packed_ops.module_train_mode(m) is True
    m.eval()
    assert packed_ops.module_train_mode(m) is False
    m.train()
    assert packed_ops.module_train_mode(m) is True

    # legacy fallback: no flag, no BN → not training (head unrouted,
    # the conservative direction: eval consumers get plain NHWC)
    class NoSignal(nnx.Module):
        def __init__(self, *, rngs: nnx.Rngs):
            self.conv = nnx.Conv(3, 19, (1, 1), rngs=rngs)

    assert packed_ops.module_train_mode(NoSignal(rngs=nnx.Rngs(0))) is False


@pytest.mark.parametrize(
    "name", [(c.values if hasattr(c, "values") else c)[0] for c in CASES])
def test_explicit_mode_flag_tracks_train_eval(name):
    """Every packed-head model carries the explicit flag and nnx
    train()/eval() keeps it in lockstep with its BatchNorms."""
    from torch_semantic_segmentation_tpu.ops import packed_ops

    m = get_model(name, num_classes=19, rngs=nnx.Rngs(0))
    assert m.use_running_average is False
    assert packed_ops.module_train_mode(m) is True
    m.eval()
    assert m.use_running_average is True
    assert packed_ops.module_train_mode(m) is False
    bns = [s for _, s in nnx.iter_modules(m) if isinstance(s, nnx.BatchNorm)]
    assert bns and all(b.use_running_average for b in bns)
    m.train()
    assert packed_ops.module_train_mode(m) is True
    assert not any(b.use_running_average for b in bns)


def test_packed_resize_head_off_when_no_pack_fits(monkeypatch):
    """num_classes large enough that even the smallest pack exceeds the
    lane-row budget (8·200 > 1280) → apply_packed_resize_head returns
    None and the model falls back to the plain NHWC resize."""
    monkeypatch.setenv("TPU_SEG_PACKED_LEDNET", "1")
    m = get_model("lednet", num_classes=200, rngs=nnx.Rngs(0))
    m.eval()
    x = jnp.zeros((1, 16, 32, 3), jnp.float32)
    out = m(x)
    assert isinstance(out, jax.Array) and out.shape == (1, 16, 32, 200)


def test_conv_form_resize_head_matches_resize_bilinear():
    """The structured-conv packed resize head (round 4,
    plan_packed_resize_w): kernel scatter-built from _interp_matrix and
    verified against it, so values match resize_bilinear to fp32 noise;
    non-pack-periodic patterns (align_corners=True here) and <3-pack
    widths fall back (None)."""
    from torch_semantic_segmentation_tpu.ops.packed_ops import (
        apply_packed_resize_conv_head)
    from torch_semantic_segmentation_tpu.ops.upsample import resize_bilinear

    rng = np.random.default_rng(3)
    for (h, w, oh, ow, c) in [(8, 16, 64, 128, 19), (16, 32, 128, 256, 19),
                              (13, 16, 104, 128, 19)]:
        y = jnp.asarray(rng.normal(size=(2, h, w, c)), jnp.float32)
        got = apply_packed_resize_conv_head(y, (oh, ow))
        assert got is not None, (h, w, oh, ow)
        want = resize_bilinear(y, (oh, ow))
        np.testing.assert_allclose(np.asarray(got.unpack()),
                                   np.asarray(want), atol=2e-6)
    y = jnp.asarray(rng.normal(size=(1, 8, 16, 19)), jnp.float32)
    # gradient parity (same interpolation weights → same adjoint)
    g1 = jax.grad(lambda t: jnp.sum(
        apply_packed_resize_conv_head(t, (64, 128)).unpack() ** 2))(y)
    g2 = jax.grad(lambda t: jnp.sum(resize_bilinear(t, (64, 128)) ** 2))(y)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-4)
    # fallbacks: non-periodic + too-few-packs
    assert apply_packed_resize_conv_head(y, (64, 128),
                                         align_corners=True) is None
    y5 = jnp.asarray(rng.normal(size=(1, 4, 8, 5)), jnp.float32)
    assert apply_packed_resize_conv_head(y5, (32, 64)) is None
