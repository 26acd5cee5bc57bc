"""Parity of the whole-LDS W-packed region (ops/packed_lds.py) against
the standard NHWC LearningToDownsample path: forward values, BN
running-stat updates, and gradients must match at fp32 (float
reassociation tolerance only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from torch_semantic_segmentation_tpu.models.fastscnn import (
    LearningToDownsample)
from torch_semantic_segmentation_tpu.ops import packed_lds


def _lds():
    return LearningToDownsample(3, (32, 48, 64), rngs=nnx.Rngs(0))


def _x(n=2, h=64, w=64):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(n, h, w, 3)).astype(np.float32))


def test_supports_divisibility():
    assert packed_lds.supports((1, 64, 64, 3))
    assert packed_lds.supports((1, 1024, 2048, 3))
    # W must divide the stem input pack (2*p1 = 16 at the default chain)
    assert not packed_lds.supports((1, 64, 40, 3))
    assert packed_lds.supports((1, 64, 48, 3))


def test_forward_parity_and_bn_stats():
    x = _x()
    ref_m, pk_m = _lds(), _lds()
    ref = ref_m.ds2(ref_m.ds1(ref_m.conv(x)))
    got = packed_lds.lds_forward(pk_m, x)
    assert got.shape == ref.shape == (2, 8, 8, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # the packed path updated the same BatchNorm running stats
    for name in ("conv", "ds1", "ds2"):
        r, p = getattr(ref_m, name), getattr(pk_m, name)
        bns = ([r.bn], [p.bn]) if name == "conv" else (
            [r.dw.bn, r.pw.bn], [p.dw.bn, p.pw.bn])
        for rb, pb in zip(*bns):
            np.testing.assert_allclose(np.asarray(pb.mean[...]),
                                       np.asarray(rb.mean[...]),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(pb.var[...]),
                                       np.asarray(rb.var[...]),
                                       rtol=1e-5, atol=1e-6)


def test_eval_mode_parity():
    x = _x()
    ref_m, pk_m = _lds(), _lds()
    # push some stats first so eval normalizes with non-initial stats
    ref_m.ds2(ref_m.ds1(ref_m.conv(x)))
    packed_lds.lds_forward(pk_m, x)
    ref_m.eval()
    pk_m.eval()
    ref = ref_m.ds2(ref_m.ds1(ref_m.conv(x)))
    got = packed_lds.lds_forward(pk_m, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradient_parity():
    x = _x()

    def loss(graphdef, state, x, packed):
        m = nnx.merge(graphdef, state)
        y = (packed_lds.lds_forward(m, x) if packed
             else m.ds2(m.ds1(m.conv(x))))
        return jnp.sum(y * y)

    m = _lds()
    graphdef, state = nnx.split(m)
    g_ref = jax.grad(loss, argnums=1)(graphdef, state, x, False)
    g_pk = jax.grad(loss, argnums=1)(graphdef, state, x, True)
    ref_leaves = jax.tree.leaves_with_path(g_ref)
    pk_leaves = dict(jax.tree.leaves_with_path(g_pk))
    assert ref_leaves
    for path, leaf in ref_leaves:
        other = pk_leaves[path]
        np.testing.assert_allclose(
            np.asarray(other), np.asarray(leaf), rtol=5e-4, atol=5e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_folded_bn_serving_parity():
    """The serving path folds BN into conv kernel/bias (ops.fold) and sets
    bn=None — the packed region must then apply the folded bias P-tiled
    (regression: round-3 inference bench crashed on bn=None)."""
    from torch_semantic_segmentation_tpu.ops.fold import fold_batchnorm

    x = _x()
    m = _lds()
    # settle stats, then fold for serving
    m.ds2(m.ds1(m.conv(x)))
    m.eval()
    fold_batchnorm(m)
    assert m.conv.bn is None and m.conv.conv.bias is not None
    ref = m.ds2(m.ds1(m.conv(x)))
    got = packed_lds.lds_forward(m, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_model_routing_env_flag(monkeypatch):
    from torch_semantic_segmentation_tpu.models.fastscnn import fastscnn
    x = _x(1, 64, 64)
    m = fastscnn(7, rngs=nnx.Rngs(1))
    monkeypatch.setenv("FASTSCNN_PACKED_LDS", "0")
    ref = m(x)
    m2 = fastscnn(7, rngs=nnx.Rngs(1))
    monkeypatch.setenv("FASTSCNN_PACKED_LDS", "1")
    got = m2(x)
    # end-to-end logits: LDS tap-order reassociation amplified through
    # GFE/FFM/classifier BN chains — tolerance is logit-scale, not op-scale
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-3, atol=2e-3)


def test_packed_input_aug_matches_nhwc(monkeypatch):
    """Packed-input aug API (round 4): AugmentConfig.pack emits
    PackedImages matching the NHWC aug output to f32 ulp (the blocked
    W-warp einsum may compile with a different contraction grouping, so
    the 2-hot sums can differ in the last bit; labels are exact), and
    FastSCNN consumes it on both the packed-LDS route (data used
    directly) and the standard route (unpacked reshape)."""
    import dataclasses

    from torch_semantic_segmentation_tpu.data.transforms import (
        AugmentConfig, augment_batch)
    from torch_semantic_segmentation_tpu.models import get_model
    from torch_semantic_segmentation_tpu.ops.packed_ops import PackedImages

    rng = np.random.default_rng(17)
    imgs = jnp.asarray(rng.integers(0, 256, (2, 48, 96, 3)), jnp.uint8)
    lbls = jnp.asarray(rng.integers(0, 19, (2, 48, 96)), jnp.int32)
    key = jax.random.PRNGKey(5)
    cfg = AugmentConfig(crop=(32, 64))
    cfgp = dataclasses.replace(cfg, pack=16)

    a_img, a_lbl = augment_batch(imgs, lbls, key, cfg)
    p_img, p_lbl = augment_batch(imgs, lbls, key, cfgp)
    assert isinstance(p_img, PackedImages)
    assert p_img.shape == a_img.shape
    np.testing.assert_allclose(np.asarray(p_img.unpack()),
                               np.asarray(a_img), rtol=0, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(p_lbl), np.asarray(a_lbl))

    m = get_model("fastscnn", num_classes=7, rngs=nnx.Rngs(0))
    m.eval()
    for lds_env in ("1", "0"):
        monkeypatch.setenv("FASTSCNN_PACKED_LDS", lds_env)
        y_plain = m(a_img)
        y_packed = m(p_img)
        # input-ulp differences propagate through the model; both routes
        # (packed data consumed directly / unpacked reshape) must agree
        # to forward-noise level
        np.testing.assert_allclose(np.asarray(y_plain),
                                   np.asarray(y_packed),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"FASTSCNN_PACKED_LDS={lds_env}")
