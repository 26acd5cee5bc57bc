"""Pallas kernel tests (interpret mode on the CPU test backend): the fused
upsample+concat skip kernel must match the XLA matmul-resize reference
bit-closely in fp32 and agree under autodiff (custom VJP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_semantic_segmentation_tpu.ops.pallas_upsample import (
    _fused, _reference, upsample2x_concat)

SHAPES = [(8, 16, 4, 4), (6, 10, 3, 5), (16, 8, 128, 64), (4, 4, 1, 2)]


@pytest.mark.parametrize("h,w,cl,cs", SHAPES)
def test_forward_matches_reference(h, w, cl, cs):
    rng = np.random.default_rng(0)
    low = jnp.asarray(rng.normal(size=(2, h, w, cl)).astype(np.float32))
    skip = jnp.asarray(rng.normal(size=(2, 2 * h, 2 * w, cs)).astype(np.float32))
    got = _fused(low, skip, True)           # interpret mode
    want = _reference(low, skip)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    rng = np.random.default_rng(1)
    low = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    skip = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
    gp = jax.grad(lambda l, s: jnp.sum(jnp.sin(_fused(l, s, True))), (0, 1))(
        low, skip)
    gr = jax.grad(lambda l, s: jnp.sum(jnp.sin(_reference(l, s))), (0, 1))(
        low, skip)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               rtol=1e-5, atol=1e-5)


def test_auto_dispatch_falls_back_on_cpu():
    # on the CPU test backend the public API must take the XLA path
    low = jnp.zeros((1, 4, 4, 2))
    skip = jnp.ones((1, 8, 8, 3))
    out = upsample2x_concat(low, skip)
    assert out.shape == (1, 8, 8, 5)
    np.testing.assert_array_equal(np.asarray(out[..., 2:]), 1.0)


def test_unet_bilinear_uses_fused_path():
    from flax import nnx
    from torch_semantic_segmentation_tpu.models import get_model

    m = get_model("unet", num_classes=3, base_ch=4, upsample="bilinear")
    m.eval()
    y = m(jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert y.shape == (1, 32, 32, 3)


# ---------------- fused depthwise-separable conv ----------------

from torch_semantic_segmentation_tpu.ops.pallas_sepconv import (  # noqa: E402
    _reference as _sep_reference, fused_separable_conv)


def _sep_inputs(seed, h, w, c, co):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(2, h, w, c)).astype(np.float32))
    dwk = jnp.asarray(rng.normal(size=(3, 3, c)).astype(np.float32) * 0.2)
    dwb = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
    pwk = jnp.asarray(rng.normal(size=(c, co)).astype(np.float32) * 0.2)
    pwb = jnp.asarray(rng.normal(size=(co,)).astype(np.float32) * 0.1)
    return x, dwk, dwb, pwk, pwb


@pytest.mark.parametrize("h,w,c,co,dil", [
    (16, 24, 8, 16, 1),       # plain
    (16, 24, 8, 16, 4),       # FFM-style dilated dw
    (12, 40, 24, 8, 1),       # non-pow2 W, C>Co
    (8, 8, 3, 5, 2),          # tiny channels, border-heavy
])
def test_sepconv_forward_matches_reference(h, w, c, co, dil):
    x, dwk, dwb, pwk, pwb = _sep_inputs(0, h, w, c, co)
    got = fused_separable_conv(x, dwk, dwb, pwk, pwb, dilation=dil,
                               use_pallas=True)  # interpret mode on CPU
    want = _sep_reference(x, dwk, dwb, pwk, pwb, stride=1, dilation=dil,
                          relu_mid=True, relu_out=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_sepconv_no_relu_variants():
    x, dwk, dwb, pwk, pwb = _sep_inputs(1, 8, 16, 4, 4)
    for rm, ro in [(False, True), (True, False), (False, False)]:
        got = fused_separable_conv(x, dwk, dwb, pwk, pwb, relu_mid=rm,
                                   relu_out=ro, use_pallas=True)
        want = _sep_reference(x, dwk, dwb, pwk, pwb, stride=1, dilation=1,
                              relu_mid=rm, relu_out=ro)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_sepconv_torch_oracle_parity():
    """The fused kernel equals torch Conv2d(groups=C) → Conv2d(1×1) with
    biases (the folded-BN inference composition) within fp32 tolerance."""
    import torch
    import torch.nn.functional as TF

    h, w, c, co = 12, 20, 6, 10
    x, dwk, dwb, pwk, pwb = _sep_inputs(2, h, w, c, co)
    got = fused_separable_conv(x, dwk, dwb, pwk, pwb, use_pallas=True)

    xt = torch.from_numpy(np.transpose(np.asarray(x), (0, 3, 1, 2)))
    # dw HWC → torch (C,1,kh,kw); pw (C,Co) → (Co,C,1,1)
    dwt = torch.from_numpy(np.transpose(np.asarray(dwk), (2, 0, 1))[:, None])
    pwt = torch.from_numpy(np.asarray(pwk).T[:, :, None, None].copy())
    with torch.no_grad():
        y = TF.relu(TF.conv2d(xt, dwt, torch.from_numpy(np.asarray(dwb)),
                              padding=1, groups=c))
        y = TF.relu(TF.conv2d(y, pwt, torch.from_numpy(np.asarray(pwb))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), y.numpy(),
        rtol=1e-4, atol=1e-4)


def test_sepconv_stride2_falls_back():
    x, dwk, dwb, pwk, pwb = _sep_inputs(3, 8, 8, 4, 6)
    got = fused_separable_conv(x, dwk, dwb, pwk, pwb, stride=2,
                               use_pallas=True)
    assert got.shape == (2, 4, 4, 6)
    want = _sep_reference(x, dwk, dwb, pwk, pwb, stride=2, dilation=1,
                          relu_mid=True, relu_out=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_sepconv_module_fold_matches_kernel():
    """Folded SeparableConv module → fused kernel inputs: the kernel output
    (interpret mode) equals the module's folded eval forward."""
    from flax import nnx
    from torch_semantic_segmentation_tpu.ops import SeparableConv
    from torch_semantic_segmentation_tpu.ops.fold import fold_conv_bn_act

    rng = np.random.default_rng(4)
    sep = SeparableConv(6, 10, 3, rngs=nnx.Rngs(0))
    for blk in (sep.dw, sep.pw):
        blk.bn.mean[...] = jnp.asarray(
            rng.normal(0, 0.5, blk.bn.mean.shape).astype(np.float32))
        blk.bn.var[...] = jnp.asarray(
            rng.uniform(0.5, 2.0, blk.bn.var.shape).astype(np.float32))
    sep.eval()
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 6)).astype(np.float32))
    want = sep(x)                       # eval BN path
    assert fold_conv_bn_act(sep.dw) and fold_conv_bn_act(sep.pw)
    folded = sep(x)                     # folded, CPU → unfused conv path
    np.testing.assert_allclose(np.asarray(folded), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    got = fused_separable_conv(
        x, sep.dw.conv.kernel[...].reshape(3, 3, 6), sep.dw.conv.bias[...],
        sep.pw.conv.kernel[...].reshape(6, 10), sep.pw.conv.bias[...],
        use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(folded),
                               rtol=1e-4, atol=1e-5)
