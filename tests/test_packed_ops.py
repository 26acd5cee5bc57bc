"""Parity tests for the generic W-packed toolkit (ops/packed_ops.py).

Every packed op must match its NHWC reference implementation exactly up
to float reassociation at fp32 — same contract as tests/test_packed_lds.py.
Reference behavior: SURVEY.md §2.2 op rows (cuDNN convs / F.cross_entropy
in the reference stack).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from torch_semantic_segmentation_tpu.ops import packed_ops
from torch_semantic_segmentation_tpu.ops.packed_ops import (
    PackedLogits, as_nhwc, pack, packed_channel_concat, packed_cross_entropy,
    packed_max_pool2x2_indices, packed_max_unpool2x2, packed_prelu,
    plan_packed_conv, plan_packed_deconv, unpack)


def _nhwc_conv(x, k, stride, dilation, padding, groups=1):
    ph, pw = padding
    return jax.lax.conv_general_dilated(
        x, k, window_strides=stride, padding=((ph, ph), (pw, pw)),
        rhs_dilation=dilation, feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


CONV_CASES = [
    # (kh, kw), stride, dilation, padding, c_in, c_out, p_in, groups
    ((3, 3), (1, 1), (1, 1), (1, 1), 16, 16, 8, 1),
    ((3, 3), (2, 2), (1, 1), (1, 1), 16, 64, 8, 1),
    ((2, 2), (2, 2), (1, 1), (0, 0), 16, 16, 8, 1),
    ((1, 1), (1, 1), (1, 1), (0, 0), 64, 16, 4, 1),
    ((3, 3), (1, 1), (2, 2), (2, 2), 8, 8, 4, 1),
    ((3, 3), (1, 1), (4, 4), (4, 4), 8, 8, 8, 1),
    ((5, 1), (1, 1), (1, 1), (2, 0), 8, 8, 4, 1),
    ((1, 5), (1, 1), (1, 1), (0, 2), 8, 8, 4, 1),
    ((3, 3), (1, 1), (1, 1), (1, 1), 8, 8, 4, 8),     # depthwise
    ((3, 3), (1, 1), (1, 1), (1, 1), 8, 16, 4, 2),    # grouped
]


@pytest.mark.parametrize(
    "ks,stride,dil,pad,c_in,c_out,p_in,groups", CONV_CASES)
def test_packed_conv_matches_nhwc(ks, stride, dil, pad, c_in, c_out, p_in,
                                  groups):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    h, w = 16, 32
    x = jax.random.normal(k1, (2, h, w, c_in), jnp.float32)
    k = jax.random.normal(k2, (*ks, c_in // groups, c_out), jnp.float32) * 0.3
    ref = _nhwc_conv(x, k, stride, dil, pad, groups)

    p_out = p_in // stride[1]
    plan = plan_packed_conv(c_in, c_out, ks, p_in, p_out, stride=stride,
                            dilation=dil, padding=pad, groups=groups)
    got = unpack(plan(pack(x, p_in), k), c_out)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "ks,stride,pad,opad,c_in,c_out,p_in",
    [((3, 3), (2, 2), (1, 1), (1, 1), 16, 19, 1),     # ENet fullconv head
     ((3, 3), (2, 2), (1, 1), (1, 1), 16, 19, 8),     # chained packed-in
     ((3, 3), (2, 2), (1, 1), (1, 1), 8, 8, 4),
     ((2, 2), (2, 2), (0, 0), (0, 0), 8, 8, 1),
     ((2, 2), (2, 2), (0, 0), (0, 0), 8, 8, 4)])
def test_packed_deconv_matches_conv_transpose(ks, stride, pad, opad, c_in,
                                              c_out, p_in):
    from torch_semantic_segmentation_tpu.ops.conv import ConvTranspose2d

    key = jax.random.PRNGKey(1)
    mod = ConvTranspose2d(c_in, c_out, ks, stride=stride, padding=pad,
                          output_padding=opad, use_bias=False,
                          rngs=nnx.Rngs(0))
    h, w = 12, 32
    x = jax.random.normal(key, (2, h, w, c_in), jnp.float32)
    ref = mod(x)

    p_out = max(2 * p_in, 4) if p_in > 1 else 8
    plan = plan_packed_deconv(c_in, c_out, ks, p_in, p_out, stride=stride,
                              padding=pad, output_padding=opad)
    xin = x if p_in == 1 else pack(x, p_in)
    got = unpack(plan(xin, mod.kernel[...]), c_out)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_packed_conv_grads_flow_to_weights():
    ks, c, p = (3, 3), 8, 4
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 8, 16, c), jnp.float32)
    k = jax.random.normal(key, (*ks, c, c), jnp.float32) * 0.3
    plan = plan_packed_conv(c, c, ks, p, p)

    def f_packed(k):
        return jnp.sum(plan(pack(x, p), k) ** 2)

    def f_ref(k):
        return jnp.sum(_nhwc_conv(x, k, (1, 1), (1, 1), (1, 1)) ** 2)

    gp = jax.grad(f_packed)(k)
    gr = jax.grad(f_ref)(k)
    np.testing.assert_allclose(gp, gr, rtol=1e-4, atol=1e-4)


def test_packed_pool_unpool_matches_nhwc():
    from torch_semantic_segmentation_tpu.ops.pool import (
        max_pool2x2_with_indices, max_unpool2x2)

    c, p = 16, 8
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 32, c), jnp.float32)
    ref_v, ref_i = max_pool2x2_with_indices(x)
    got_v, got_i = packed_max_pool2x2_indices(pack(x, p), c)
    np.testing.assert_allclose(unpack(got_v, c), ref_v, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(
        unpack(got_i, c).astype(np.int32), np.asarray(ref_i))

    # unpool with forwarded indices from a DIFFERENT tensor (ENet pattern)
    y = jax.random.normal(jax.random.PRNGKey(4), ref_v.shape, jnp.float32)
    ref_u = max_unpool2x2(y, ref_i)
    got_u = packed_max_unpool2x2(pack(y, p // 2), got_i, c)
    np.testing.assert_allclose(unpack(got_u, c), ref_u, rtol=1e-6, atol=1e-6)


def test_packed_concat_and_prelu():
    c1, c2, p = 13, 3, 8
    a = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 16, c1), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 16, c2), jnp.float32)
    ref = jnp.concatenate([a, b], axis=-1)
    got = packed_channel_concat([(pack(a, p), c1), (pack(b, p), c2)], p)
    np.testing.assert_allclose(unpack(got, c1 + c2), ref, rtol=1e-6, atol=1e-6)

    alpha = jnp.linspace(0.1, 0.4, c1 + c2)
    ref_p = jnp.where(ref >= 0, ref, alpha * ref)
    got_p = packed_prelu(alpha, got, c1 + c2)
    np.testing.assert_allclose(unpack(got_p, c1 + c2), ref_p,
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("weights", [None, "weighted"])
def test_packed_cross_entropy_matches_reference(weights):
    from torch_semantic_segmentation_tpu.losses import cross_entropy_loss

    c, p = 19, 4
    n, h, w = 2, 8, 32
    key = jax.random.PRNGKey(7)
    logits = jax.random.normal(key, (n, h, w, c), jnp.float32) * 3.0
    labels = jax.random.randint(jax.random.PRNGKey(8), (n, h, w), 0, c)
    labels = labels.at[0, 0].set(255)                 # ignore rows
    cw = None if weights is None else jnp.linspace(0.2, 2.0, c)

    ref = cross_entropy_loss(logits, labels, class_weights=cw)
    got = packed_cross_entropy(pack(logits, p), labels, c, class_weights=cw)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    gr = jax.grad(lambda l: cross_entropy_loss(l, labels, class_weights=cw))(
        logits)
    gp = jax.grad(lambda l: packed_cross_entropy(l, labels, c,
                                                 class_weights=cw))(
        pack(logits, p))
    np.testing.assert_allclose(unpack(gp, c), gr, rtol=1e-5, atol=1e-7)


def test_packed_cross_entropy_all_ignored():
    c, p = 19, 4
    logits = jnp.ones((1, 4, 16, c), jnp.float32)
    labels = jnp.full((1, 4, 16), 255, jnp.int32)
    got = packed_cross_entropy(pack(logits, p), labels, c)
    assert float(got) == 0.0


def test_packed_logits_pytree_and_consumers():
    from torch_semantic_segmentation_tpu.losses import cross_entropy_loss

    c, p = 19, 4
    logits = jax.random.normal(jax.random.PRNGKey(9), (1, 8, 16, c),
                               jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(10), (1, 8, 16), 0, c)
    pl = PackedLogits(pack(logits, p), c)
    assert pl.shape == logits.shape
    np.testing.assert_allclose(as_nhwc(pl), logits)
    leaves, treedef = jax.tree_util.tree_flatten(pl)
    assert len(leaves) == 1
    pl2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert pl2.c == c

    # the standard loss consumes PackedLogits natively
    ref = cross_entropy_loss(logits, labels)
    got = cross_entropy_loss(pl, labels)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("exact", [True, False])
@pytest.mark.parametrize("weights", [None, "cw"])
def test_ohem_on_packed_logits_matches_nhwc(exact, weights):
    """OHEM consumes PackedLogits IN packed layout (VERDICT r3 next #7
    removed the silent unpack): top-k/threshold/mean are permutation-
    invariant over pixels, so the loss and the (unpacked) gradient must
    equal the NHWC computation for both selector variants."""
    from torch_semantic_segmentation_tpu.losses import ohem_cross_entropy
    from torch_semantic_segmentation_tpu.ops.packed_ops import PackedLogits

    c, p = 19, 8
    n, h, w = 2, 8, 64
    logits = jax.random.normal(jax.random.PRNGKey(3), (n, h, w, c),
                               jnp.float32) * 3.0
    labels = jax.random.randint(jax.random.PRNGKey(4), (n, h, w), 0, c)
    labels = labels.at[0, :2].set(255)
    cw = None if weights is None else jnp.linspace(0.2, 2.0, c)

    def f_ref(l):
        return ohem_cross_entropy(l, labels, thresh=0.7, min_kept=200,
                                  class_weights=cw, exact=exact)

    def f_packed(l):
        return ohem_cross_entropy(PackedLogits(l, c), labels, thresh=0.7,
                                  min_kept=200, class_weights=cw,
                                  exact=exact)

    ref, gr = jax.value_and_grad(f_ref)(logits)
    got, gp = jax.value_and_grad(f_packed)(pack(logits, p))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)
    np.testing.assert_allclose(unpack(gp, c), gr, rtol=1e-5, atol=1e-7)


def test_route_packed_head_default_off(monkeypatch):
    """Measured-negative routing position (BiSeNet heads, ERFNet body —
    2026-08-20 zoo A/B): default_on=False never routes by default even
    on a TPU backend (TPU_SEG_PACKED=1 emulates one here), but the
    explicit model env var still opts in, and =0 still kills."""
    from torch_semantic_segmentation_tpu.ops.packed_ops import (
        route_packed_head)

    monkeypatch.setenv("TPU_SEG_PACKED", "1")   # enabled() true off-TPU
    assert route_packed_head("X_TEST_VAR", True) is True
    assert route_packed_head("X_TEST_VAR", True, default_on=False) is False
    monkeypatch.setenv("X_TEST_VAR", "1")
    assert route_packed_head("X_TEST_VAR", False, default_on=False) is True
    monkeypatch.setenv("X_TEST_VAR", "0")
    assert route_packed_head("X_TEST_VAR", True, default_on=False) is False
