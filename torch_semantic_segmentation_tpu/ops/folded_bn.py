"""Training-time BatchNorm folding for 1×1 convs (moment-matmul form).

The training-mode conv→BN→act chain forces XLA into three HBM passes over
the conv output `e0`: write it (conv), read it (batch-stats reduce), read
it again and write the normalized tensor (apply). For the expansion convs
of the inverted-residual blocks (SURVEY.md §2.1 "FastSCNN" GFE; the
reference trains these through cuDNN + BN the same three-pass way) `e0`
is the LARGEST tensor in the network — 6× the block width at up to 1/8
resolution — and scripts/diag_step_bytes.py attributes ~40 GB/step at
b40 full-res to the GFE, most of it these crossings.

For a stride-1, group-1 **1×1** conv the three passes are unnecessary,
because the batch statistics of `e0 = x·W (+ b)` are exact functions of
the *input's* first two moments:

    E[e0]      = μx·W + b
    E[e0²]_j   = (Wᵀ·E[x xᵀ]·W)_jj
    var(e0)_j  = E[e0²]_j − (μx·W)_j²          (bias-independent)

— the same fast-variance form (E[x²]−E[x]²) flax's BatchNorm uses, just
computed against the small Cin×Cin second-moment matrix instead of the
huge pre-activation tensor. Both moment reductions read only the conv
INPUT (MXU matmuls with f32 accumulation); the normalization then folds
into the conv as W' = W·diag(γ/√(var+ε)), b' = β − μ·γ/√(var+ε), so the
only full-size tensor that ever exists is the post-BN/act output the
next layer consumes anyway.

Numerics: identical math to nnx.BatchNorm up to float reassociation
(moments accumulate in f32 on the MXU; flax reduces the e0 tensor in
f32). Gradients are exact by construction — autodiff flows through
μx/E[xxᵀ] into x and W the same way it flows through flax's batch stats.
Running statistics are updated with the same momentum/stop-gradient
schedule as nnx.BatchNorm, so eval-mode behavior and checkpoint state
are unchanged.

Sync-BN: under a GSPMD-sharded batch the two moment reductions reduce
over the global batch exactly like flax's — XLA inserts the ICI
all-reduce (SURVEY.md §2.2 "BatchNorm").

Routing (`ConvBNAct._maybe_folded_train_1x1`): TPU backends by default,
`TPU_SEG_FOLDED_BN=0/1` overrides; only where the byte trade wins
(`fold_wins`): the fold reads the input one extra time (the moment
matmul) and saves ~3 crossings of the output, so it pays off iff
3·C_out·pixels_out > C_in·pixels_in, i.e. 3·C_out > C_in at stride 1.
Expansion convs (C_out = 6·C_in) and same-width pointwise convs win;
projection convs (C_in ≫ C_out) lose and stay on the standard path.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def enabled() -> bool:
    """On for TPU backends; TPU_SEG_FOLDED_BN=1/0 overrides (tests)."""
    env = os.environ.get("TPU_SEG_FOLDED_BN")
    if env is not None:
        return env != "0"
    return jax.default_backend() == "tpu"


def fold_wins(c_in: int, c_out: int) -> bool:
    """Byte trade, measured (scripts/diag_folded_bn.py, b40 full-res):
    the fold saves ~3 output-sized crossings forward but its backward
    adds ~4 input-sized crossings (the stats gradient dx += x·M
    materializes an input-sized f32 tensor and an add pass that
    standard BN backward computes fused). Same-width pointwise convs
    LOSE (classifier 14.6 → 20.6 GB at 128→128); 6× expansion convs
    win (inverted-residual block1 13.4 → 11.2 GB). Route only clear
    winners: C_out ≥ 3·C_in."""
    return c_out >= 3 * c_in


def folded_1x1_weights(conv, bn, x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Folded (W', b') for a training-mode 1×1 conv → BN, from the
    input's first two moments. Updates bn.mean/bn.var in place
    (momentum, stop-gradient) exactly as the standard path would.
    Returns W' (Cin, Cout) f32 and b' (Cout,) f32; autodiff flows
    through the moment matmuls into x and the conv/BN params."""
    w = conv.kernel[...]
    c_in, c_out = w.shape[2], w.shape[3]
    wf = w.reshape(c_in, c_out).astype(jnp.float32)

    # input moments in f32 (MXU accumulates f32 from bf16 operands);
    # reductions run over every non-feature axis of the global batch
    xr = x.reshape(-1, c_in)
    n = xr.shape[0]
    second = jnp.einsum("pa,pb->ab", xr, xr,
                        preferred_element_type=jnp.float32) / n
    mu_x = jnp.mean(xr, axis=0, dtype=jnp.float32)

    mu_lin = mu_x @ wf                                     # E[x·W]
    mu_e = mu_lin
    if conv.bias is not None:
        mu_e = mu_e + conv.bias[...].astype(jnp.float32)
    e2 = jnp.einsum("aj,ab,bj->j", wf, second, wf)         # E[(x·W)²]
    var_e = jnp.maximum(e2 - mu_lin * mu_lin, 0.0)

    sg = jax.lax.stop_gradient
    bn.mean[...] = sg(bn.momentum * bn.mean[...]
                      + (1 - bn.momentum) * mu_e.astype(bn.mean.dtype))
    bn.var[...] = sg(bn.momentum * bn.var[...]
                     + (1 - bn.momentum) * var_e.astype(bn.var.dtype))

    gamma = (bn.scale[...].astype(jnp.float32)
             if bn.scale is not None else jnp.float32(1.0))
    beta = (bn.bias[...].astype(jnp.float32)
            if bn.bias is not None else jnp.float32(0.0))
    s = gamma * jax.lax.rsqrt(var_e + bn.epsilon)
    # y = (x·W + b − μ_e)·s + β  ⇒  conv(x, W·s) + (β + (b − μ_e)·s)
    b_fold = beta - mu_e * s
    if conv.bias is not None:
        b_fold = b_fold + conv.bias[...].astype(jnp.float32) * s
    return wf * s[None, :], b_fold


def conv1x1_bn_act(conv, bn, act_fn, x: jax.Array) -> jax.Array:
    """Training-mode conv(1×1) → BN → act with BN folded into the conv.

    `conv` is an nnx.Conv with kernel_size (1,1), stride 1, groups 1;
    `bn` an nnx.BatchNorm in training mode (use_running_average=False).
    """
    w_fold2, b_fold = folded_1x1_weights(conv, bn, x)
    c_in, c_out = w_fold2.shape
    w = conv.kernel[...]

    # nnx.Conv dtype contract: compute at conv.dtype, else promote(x, W)
    cd = (jnp.dtype(conv.dtype) if conv.dtype is not None
          else jnp.promote_types(x.dtype, w.dtype))
    w_fold = w_fold2.astype(cd).reshape(1, 1, c_in, c_out)
    y = jax.lax.conv_general_dilated(
        x.astype(cd), w_fold, window_strides=(1, 1),
        padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # match the standard path's output dtype: BN promotes (y, scale, bias)
    # to bn.dtype (or their promotion) — with dtype=bf16 both paths emit
    # bf16; with dtype=None both promote to the params' f32
    if bn.dtype is not None:
        out_dtype = jnp.dtype(bn.dtype)
    else:
        out_dtype = jnp.promote_types(cd, bn.mean.dtype)
    y = (y + b_fold.astype(y.dtype)).astype(out_dtype)
    return act_fn(y)
