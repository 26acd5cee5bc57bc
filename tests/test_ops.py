"""Op-level numeric parity vs torch-cpu oracles (SURVEY.md §4.1).

The judged contract requires per-pixel logit parity under converted
reference checkpoints (BASELINE.json north_star); these tests pin the
op-level semantics that parity depends on: conv padding/dilation/groups,
transposed-conv (stride/padding/output_padding), bilinear align_corners
conventions, max-pool/unpool index semantics, adaptive average pooling,
and BatchNorm statistics conventions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
from flax import nnx

from torch_semantic_segmentation_tpu import ops


def _np(x):
    return np.asarray(x)


def assert_close(a, b, atol=1e-4, rtol=1e-4):
    np.testing.assert_allclose(_np(a), _np(b), atol=atol, rtol=rtol)


@pytest.mark.parametrize("stride,padding,dilation,groups", [
    (1, 1, 1, 1),
    (2, 1, 1, 1),
    (1, 2, 2, 1),
    (1, 4, 4, 1),
    (1, 1, 1, 8),   # depthwise (in_ch=8, groups=8)
])
def test_conv2d_parity(stride, padding, dilation, groups):
    rng = np.random.default_rng(0)
    n, h, w, cin, cout, k = 2, 16, 16, 8, 8, 3
    x = rng.normal(size=(n, h, w, cin)).astype(np.float32)
    wt = rng.normal(size=(cout, cin // groups, k, k)).astype(np.float32) * 0.1
    b = rng.normal(size=(cout,)).astype(np.float32)

    ref = F.conv2d(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(wt),
                   torch.tensor(b), stride=stride, padding=padding,
                   dilation=dilation, groups=groups)
    ref = ref.permute(0, 2, 3, 1).numpy()

    conv = ops.make_conv(cin, cout, k, stride=stride, padding=padding,
                         dilation=dilation, groups=groups, use_bias=True,
                         rngs=nnx.Rngs(0))
    conv.kernel[...] = jnp.asarray(wt.transpose(2, 3, 1, 0))  # OIHW -> HWIO
    conv.bias[...] = jnp.asarray(b)
    out = conv(jnp.asarray(x))
    assert_close(out, ref, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("k,s,p,op", [
    (2, 2, 0, 0),
    (3, 2, 1, 1),
    (4, 2, 1, 0),
    (3, 1, 1, 0),
])
def test_conv_transpose2d_parity(k, s, p, op):
    rng = np.random.default_rng(1)
    n, h, w, cin, cout = 2, 9, 11, 6, 5
    x = rng.normal(size=(n, h, w, cin)).astype(np.float32)
    wt = rng.normal(size=(cin, cout, k, k)).astype(np.float32) * 0.1
    b = rng.normal(size=(cout,)).astype(np.float32)

    ref = F.conv_transpose2d(torch.tensor(x).permute(0, 3, 1, 2),
                             torch.tensor(wt), torch.tensor(b), stride=s,
                             padding=p, output_padding=op)
    ref = ref.permute(0, 2, 3, 1).numpy()

    mod = ops.ConvTranspose2d(cin, cout, k, stride=s, padding=p,
                              output_padding=op, rngs=nnx.Rngs(0))
    mod.kernel[...] = jnp.asarray(wt.transpose(2, 3, 0, 1))  # IOHW -> HWIO
    mod.bias[...] = jnp.asarray(b)
    out = mod(jnp.asarray(x))
    assert out.shape == ref.shape
    assert_close(out, ref, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("size", [(32, 48), (7, 13), (16, 16)])
def test_resize_bilinear_parity(align_corners, size):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    ref = F.interpolate(torch.tensor(x).permute(0, 3, 1, 2), size=size,
                        mode="bilinear", align_corners=align_corners)
    ref = ref.permute(0, 2, 3, 1).numpy()
    out = ops.resize_bilinear(jnp.asarray(x), size, align_corners=align_corners)
    assert_close(out, ref, atol=1e-5, rtol=1e-5)


def test_resize_nearest_parity():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 10, 10, 3)).astype(np.float32)
    ref = F.interpolate(torch.tensor(x).permute(0, 3, 1, 2), size=(23, 17),
                        mode="nearest").permute(0, 2, 3, 1).numpy()
    out = ops.resize_nearest(jnp.asarray(x), (23, 17))
    assert_close(out, ref)


def test_maxpool_unpool_roundtrip_vs_torch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    pooled_t, idx_t = F.max_pool2d(xt, 2, 2, return_indices=True)
    unpooled_t = F.max_unpool2d(pooled_t, idx_t, 2, 2).permute(0, 2, 3, 1).numpy()

    pooled, idx = ops.max_pool2x2_with_indices(jnp.asarray(x))
    assert_close(pooled, pooled_t.permute(0, 2, 3, 1).numpy())
    unpooled = ops.max_unpool2x2(pooled, idx)
    assert_close(unpooled, unpooled_t)


@pytest.mark.parametrize("bins", [1, 2, 3, 6])
def test_adaptive_avg_pool_parity(bins):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 15, 17, 4)).astype(np.float32)
    ref = F.adaptive_avg_pool2d(torch.tensor(x).permute(0, 3, 1, 2), bins)
    ref = ref.permute(0, 2, 3, 1).numpy()
    out = ops.adaptive_avg_pool2d(jnp.asarray(x), bins)
    assert_close(out, ref, atol=1e-5, rtol=1e-5)


def test_batchnorm_train_and_eval_parity():
    rng = np.random.default_rng(6)
    x = rng.normal(size=(4, 8, 8, 7)).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(7, eps=1e-5, momentum=0.1)
    tbn.weight.data = torch.tensor(rng.normal(size=7).astype(np.float32))
    tbn.bias.data = torch.tensor(rng.normal(size=7).astype(np.float32))

    bn = ops.make_norm(7, rngs=nnx.Rngs(0))
    bn.scale[...] = jnp.asarray(tbn.weight.detach().numpy())
    bn.bias[...] = jnp.asarray(tbn.bias.detach().numpy())

    # train mode: normalise by batch stats, update running stats
    tbn.train()
    ref = tbn(torch.tensor(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
    bn.use_running_average = False
    out = bn(jnp.asarray(x))
    assert_close(out, ref, atol=1e-4, rtol=1e-3)
    assert_close(bn.mean[...], tbn.running_mean.numpy(), atol=1e-4, rtol=1e-3)
    # torch tracks running *unbiased* var; flax tracks biased. Correct for it.
    nhw = x.shape[0] * x.shape[1] * x.shape[2]
    batch_var_biased = x.reshape(-1, 7).var(axis=0)
    expected_flax_var = 0.9 * 1.0 + 0.1 * batch_var_biased
    assert_close(bn.var[...], expected_flax_var, atol=1e-4, rtol=1e-3)

    # eval mode: normalise by running stats — emulate torch eval with our stats
    tbn.eval()
    tbn.running_mean.data = torch.tensor(_np(bn.mean[...]))
    tbn.running_var.data = torch.tensor(_np(bn.var[...]))
    ref_eval = tbn(torch.tensor(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
    bn.use_running_average = True
    out_eval = bn(jnp.asarray(x))
    assert_close(out_eval, ref_eval, atol=1e-4, rtol=1e-3)


def test_prelu_parity():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 4, 4, 6)).astype(np.float32)
    alpha = rng.uniform(0.1, 0.5, size=6).astype(np.float32)
    tp_ = torch.nn.PReLU(6)
    tp_.weight.data = torch.tensor(alpha)
    ref = tp_(torch.tensor(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
    m = ops.PReLU(6, rngs=nnx.Rngs(0))
    m.alpha[...] = jnp.asarray(alpha)
    assert_close(m(jnp.asarray(x)), ref)


@pytest.mark.slow
def test_fold_batchnorm_preserves_eval_outputs():
    """ops.fold: folded conv == conv->BN in eval mode, and BN is gone."""
    from flax import nnx
    from torch_semantic_segmentation_tpu.models import fastscnn
    from torch_semantic_segmentation_tpu.ops.fold import fold_batchnorm

    m = fastscnn.fastscnn(5, rngs=nnx.Rngs(0))
    m.eval()
    # non-trivial running stats so folding is actually exercised
    import numpy as np
    rng = np.random.default_rng(0)
    for _, mod in _iter_mods(m):
        if isinstance(mod, nnx.BatchNorm):
            mod.mean[...] = jnp.asarray(
                rng.normal(0, 0.5, mod.mean.shape).astype(np.float32))
            mod.var[...] = jnp.asarray(
                rng.uniform(0.5, 2.0, mod.var.shape).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    want = m(x)
    n = fold_batchnorm(m)
    assert n > 20                       # every ConvBNAct in FastSCNN folded
    got = m(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def _iter_mods(mod, prefix=""):
    from flax import nnx
    yield prefix, mod
    for name, value in vars(mod).items():
        if name.startswith("_"):
            continue
        if isinstance(value, nnx.Module) and not isinstance(value, nnx.List):
            yield from _iter_mods(value, f"{prefix}.{name}")
        elif isinstance(value, (nnx.List, list, tuple)):
            for i, item in enumerate(value):
                if isinstance(item, nnx.Module):
                    yield from _iter_mods(item, f"{prefix}.{name}.{i}")


def test_compute_class_weights():
    from torch_semantic_segmentation_tpu.data.class_weights import (
        compute_class_weights, pixel_frequencies)
    import numpy as np

    class DS:
        def __len__(self):
            return 4
        def __getitem__(self, i):
            lbl = np.full((8, 8), i % 3, np.uint8)
            lbl[0, 0] = 255                      # ignored
            return None, lbl

    freq = pixel_frequencies(DS(), 3)
    assert abs(freq.sum() - 1.0) < 1e-6
    assert freq[0] > freq[2]                     # class 0 appears twice
    w = compute_class_weights(DS(), 3)
    assert w[2] > w[0]                           # rare class weighted up
