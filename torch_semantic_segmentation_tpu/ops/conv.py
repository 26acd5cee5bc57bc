"""Convolution building blocks with exact PyTorch numeric semantics.

The reference's conv vocabulary (SURVEY.md §2.2): strided / dilated / grouped
(depthwise) Conv2d, ConvTranspose2d, BatchNorm2d, and the fused
conv→BN→activation blocks every model in the zoo is assembled from.

TPU-native choices:
- NHWC activations, HWIO kernels — XLA:TPU's preferred layouts; convs land on
  the MXU.
- `dtype` (compute) vs `param_dtype` (storage) split: bf16 compute / fp32
  params is the TPU AMP equivalent of the reference's apex O2 (SURVEY.md
  §2.6 "AMP").
- BatchNorm batch statistics are reduced over all non-feature axes of the
  *global* (sharded) batch: under GSPMD `jit` over a data mesh axis, XLA
  inserts the cross-replica reduction — i.e. sync-BN for free (SURVEY.md
  §2.2 "BatchNorm").
- ConvTranspose2d is implemented directly via `lax.conv_general_dilated`
  with input (lhs) dilation so that torch's (kernel, stride, padding,
  output_padding) parameterisation is reproduced bit-for-bit — required for
  the judged checkpoint/logit-parity contract (BASELINE.json north_star).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx

Act = tp.Optional[str]


def _pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def activation(name: Act):
    """Resolve an activation name to a function (None → identity)."""
    if name is None or name == "identity":
        return lambda x: x
    table = {
        "relu": jax.nn.relu,
        "relu6": jax.nn.relu6,
        "gelu": jax.nn.gelu,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "hardswish": jax.nn.hard_swish,
        "silu": jax.nn.silu,
    }
    return table[name]


class PReLU(nnx.Module):
    """Parametric ReLU with per-channel slope (torch nn.PReLU parity).

    torch initialises the slope to 0.25; `num_parameters` is either 1 or the
    channel count (broadcast over the trailing channel axis in NHWC).
    """

    def __init__(self, num_parameters: int = 1, init: float = 0.25, *,
                 param_dtype=jnp.float32, rngs: nnx.Rngs | None = None):
        self.alpha = nnx.Param(jnp.full((num_parameters,), init, dtype=param_dtype))

    def __call__(self, x: jax.Array) -> jax.Array:
        a = self.alpha[...].astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class ConvTranspose2d(nnx.Module):
    """torch.nn.ConvTranspose2d with exact output-shape/value parity.

    Implemented as a regular convolution of the zero-upsampled input
    (lhs_dilation=stride) with the spatially-flipped kernel and padding
    (k-1-p, k-1-p+output_padding) per side — the textbook "gradient of conv"
    formulation, which XLA:TPU compiles onto the MXU directly.

    Kernel storage layout is HWIO with I=in_ch, O=out_ch (converted from
    torch's (in, out, kh, kw) by the compat loader).
    """

    def __init__(self, in_features: int, out_features: int, kernel_size,
                 stride=1, padding=0, output_padding=0, *, use_bias: bool = True,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kh, kw = _pair(kernel_size)
        self.stride = _pair(stride)
        self.padding = _pair(padding)
        self.output_padding = _pair(output_padding)
        self.in_features = in_features
        self.out_features = out_features
        self.dtype = dtype
        # torch init: uniform(-b, b), b = 1/sqrt(in_ch * kh * kw) — group=1.
        bound = 1.0 / (in_features * kh * kw) ** 0.5
        kkey, bkey = rngs.params(), rngs.params()
        self.kernel = nnx.Param(
            jax.random.uniform(kkey, (kh, kw, in_features, out_features),
                               param_dtype, -bound, bound))
        self.bias = (
            nnx.Param(jax.random.uniform(bkey, (out_features,), param_dtype,
                                         -bound, bound))
            if use_bias else None
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw, _, _ = self.kernel.shape
        (sh, sw), (ph, pw) = self.stride, self.padding
        oph, opw = self.output_padding
        k = self.kernel[...]
        if self.dtype is not None:
            x = x.astype(self.dtype)
            k = k.astype(self.dtype)
        else:
            k = k.astype(x.dtype)
        # flip spatial dims: transposed conv correlates with the flipped kernel
        k = k[::-1, ::-1, :, :]
        y = jax.lax.conv_general_dilated(
            x, k,
            window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph + oph),
                     (kw - 1 - pw, kw - 1 - pw + opw)),
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.bias is not None:
            y = y + self.bias[...].astype(y.dtype)
        return y


def _torch_conv_init(in_ch: int, groups: int, kernel_size) -> tuple:
    """torch Conv2d default init: kaiming_uniform(a=√5) for the kernel and
    uniform(±1/√fan_in) for the bias — matched so training-from-scratch
    behaves like the reference's (flax's default is lecun_normal)."""
    kh, kw = _pair(kernel_size)
    fan_in = (in_ch // groups) * kh * kw
    bound = 1.0 / fan_in ** 0.5   # kaiming_uniform(a=√5) ⇒ √(6/((1+5)fan)) = 1/√fan

    def kernel_init(key, shape, dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    def bias_init(key, shape, dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return kernel_init, bias_init


def make_conv(in_ch: int, out_ch: int, kernel_size, *, stride=1, padding=0,
              dilation=1, groups: int = 1, use_bias: bool = True,
              dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs) -> nnx.Conv:
    """nnx.Conv with torch Conv2d conventions (explicit symmetric padding,
    kaiming-uniform init)."""
    ph, pw = _pair(padding)
    kernel_init, bias_init = _torch_conv_init(in_ch, groups, kernel_size)
    return nnx.Conv(
        in_ch, out_ch, _pair(kernel_size),
        strides=_pair(stride),
        padding=((ph, ph), (pw, pw)),
        kernel_dilation=_pair(dilation),
        feature_group_count=groups,
        use_bias=use_bias,
        kernel_init=kernel_init, bias_init=bias_init,
        dtype=dtype, param_dtype=param_dtype, rngs=rngs,
    )


def make_norm(num_features: int, *, momentum: float = 0.9, epsilon: float = 1e-5,
              dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs) -> nnx.BatchNorm:
    """BatchNorm2d parity: torch momentum 0.1 == flax momentum 0.9, eps 1e-5.

    Statistics reduce over (N, H, W) of the global batch — sync-BN under a
    sharded-data mesh (XLA inserts the ICI all-reduce).
    """
    return nnx.BatchNorm(num_features, momentum=momentum, epsilon=epsilon,
                         use_running_average=False,
                         dtype=dtype, param_dtype=param_dtype, rngs=rngs)


class ConvBNAct(nnx.Module):
    """conv → BN → activation, the universal block of the zoo (SURVEY.md §1 L1).

    At training time this is three XLA ops the compiler fuses;
    `ops.fold.fold_batchnorm(model)` folds the eval-mode BN into the conv
    kernel/bias in place so the deployed graph is a single MXU op per block
    (`bn` becomes None).
    """

    def __init__(self, in_ch: int, out_ch: int, kernel_size=3, *, stride=1,
                 padding=None, dilation=1, groups: int = 1, act: Act = "relu",
                 use_bias: bool = False, prelu: bool = False,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        kh, kw = _pair(kernel_size)
        dh, dw = _pair(dilation)
        if padding is None:  # 'same'-style default for odd kernels
            padding = (dh * (kh - 1) // 2, dw * (kw - 1) // 2)
        self.conv = make_conv(in_ch, out_ch, kernel_size, stride=stride,
                              padding=padding, dilation=dilation, groups=groups,
                              use_bias=use_bias, dtype=dtype,
                              param_dtype=param_dtype, rngs=rngs)
        self.bn = make_norm(out_ch, dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        if prelu:
            self.act: tp.Any = PReLU(out_ch, param_dtype=param_dtype, rngs=rngs)
        else:
            self._act_name = act
            self.act = None

    def __call__(self, x: jax.Array) -> jax.Array:
        y = self._maybe_folded_train_1x1(x)
        if y is not None:
            return y
        y = self._maybe_pallas_dw(x)
        if y is None:
            y = self.conv(x)
        if self.bn is not None:
            y = self.bn(y)
        if self.act is not None:
            return self.act(y)
        return activation(self._act_name)(y)

    def _maybe_folded_train_1x1(self, x: jax.Array) -> jax.Array | None:
        """Route training-mode 1×1 conv→BN→act through the moment-matmul
        BN fold (ops.folded_bn): the pre-BN tensor — the largest tensor
        in every inverted-residual block — never reaches HBM. Identical
        math up to float reassociation; kill switch TPU_SEG_FOLDED_BN=0.
        Only where the byte trade wins (3·C_out > C_in) and only for
        stride-1 group-1 unpadded 1×1 convs (the stats identity needs
        output pixels ≡ input pixels)."""
        conv = self.conv
        if (self.bn is None or self.bn.use_running_average
                or conv.kernel_size != (1, 1)
                or conv.feature_group_count != 1
                or conv.strides not in ((1, 1), 1)
                or conv.padding != ((0, 0), (0, 0))
                or conv.kernel_dilation not in ((1, 1), 1)):
            return None
        from torch_semantic_segmentation_tpu.ops import folded_bn
        if not folded_bn.enabled():
            return None
        if not folded_bn.fold_wins(conv.in_features, conv.out_features):
            return None
        act_fn = self.act if self.act is not None else activation(self._act_name)
        return folded_bn.conv1x1_bn_act(conv, self.bn, act_fn, x)

    def _maybe_pallas_dw(self, x: jax.Array) -> jax.Array | None:
        """Route full-res depthwise 3×3 convs through the packed Pallas
        kernel (ops.pallas_dw) on TPU — XLA's lane-padded layouts move up
        to 9× the minimum HBM bytes on C<128 depthwise convs
        (docs/FULLRES_ROOFLINE.md). Exact vs the lax path up to output
        rounding; kill switch TPU_SEG_PALLAS_DW=0."""
        conv = self.conv
        if (conv.feature_group_count == 1
                or conv.feature_group_count != x.shape[-1]
                or conv.kernel_size != (3, 3)
                or conv.kernel_dilation not in ((1, 1), 1)
                or conv.strides not in ((1, 1), (2, 2), 1, 2)
                or conv.padding != ((1, 1), (1, 1))
                or conv.use_bias):
            return None
        stride = conv.strides[0] if isinstance(conv.strides, tuple) else conv.strides
        # stride-1 measured a wash vs XLA (12.7 vs 12.4 ms at c64
        # 256x512xb32); only the stride-2 layouts carry the 1.5-1.7x win
        if stride != 2:
            return None
        from torch_semantic_segmentation_tpu.ops import pallas_dw
        if not pallas_dw.routing_enabled():
            return None
        if not pallas_dw.supports(x.shape, stride, dtype=x.dtype):
            return None
        # spatial floor: below it per-program overhead beats XLA's
        # padding waste (override: TPU_SEG_PALLAS_DW_MIN_PX)
        import os
        floor = int(os.environ.get("TPU_SEG_PALLAS_DW_MIN_PX", 1 << 18))
        if x.shape[0] * x.shape[1] * x.shape[2] < floor:
            return None
        # Dtype parity with the lax path (advisor round 2): nnx.Conv
        # promotes to the conv's computation dtype (promote(x, kernel)
        # when dtype=None), while the kernel emits x.dtype. Only route
        # when the two agree so routed/unrouted graphs feed BN at the
        # same precision.
        lax_out_dtype = (jnp.dtype(conv.dtype) if conv.dtype is not None
                         else jnp.promote_types(x.dtype,
                                                conv.kernel.value.dtype))
        if lax_out_dtype != jnp.dtype(x.dtype):
            return None
        return pallas_dw.depthwise_conv3x3(x, conv.kernel.value,
                                           stride=stride)


class SeparableConv(nnx.Module):
    """Depthwise-separable conv: depthwise(k, per-channel) → BN → pointwise 1×1.

    The workhorse of FastSCNN / ContextNet / the MobileNet-style blocks
    (SURVEY.md §2.1). Depthwise uses `feature_group_count=in_ch`, which
    XLA:TPU lowers to VPU-friendly per-channel convolution.
    """

    def __init__(self, in_ch: int, out_ch: int, kernel_size=3, *, stride=1,
                 dilation=1, act: Act = "relu", relu_after_dw: bool = True,
                 dtype=None, param_dtype=jnp.float32, rngs: nnx.Rngs):
        self.dw = ConvBNAct(in_ch, in_ch, kernel_size, stride=stride,
                            dilation=dilation, groups=in_ch,
                            act=act if relu_after_dw else None,
                            dtype=dtype, param_dtype=param_dtype, rngs=rngs)
        self.pw = ConvBNAct(in_ch, out_ch, 1, act=act, dtype=dtype,
                            param_dtype=param_dtype, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        y = self._fused_inference(x)
        if y is not None:
            return y
        return self.pw(self.dw(x))

    def _fused_inference(self, x: jax.Array) -> jax.Array | None:
        """Route the folded-BN eval path through the fused Pallas
        depthwise-separable kernel (ops.pallas_sepconv) on TPU: one HBM
        round-trip instead of two. Returns None when not applicable
        (training/unfolded BN, stride≠1 handled by the kernel's own
        fallback, PReLU, non-3×3, CPU backend)."""
        from torch_semantic_segmentation_tpu.ops.pallas_sepconv import (
            fuse_conv_pair)
        return fuse_conv_pair(self.dw, self.pw, x)
