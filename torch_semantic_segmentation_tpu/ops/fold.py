"""Inference-time BatchNorm folding (SURVEY.md §1 T1 "conv-bn-act folded at
inference").

`fold_batchnorm(model)` walks the module tree and, for every ConvBNAct,
folds the BN's eval-mode affine transform into the conv kernel/bias:

    scale = γ / √(σ² + ε)
    W'    = W · scale   (per output channel)
    b'    = β + (b − μ) · scale

so the deployed graph runs one MXU op per block instead of conv + BN. The
model must be in eval mode (running statistics). Returns the number of
blocks folded; standalone BatchNorms (e.g. ENet's initial-block BN over a
concat) are left in place — they are cheap elementwise ops XLA fuses anyway.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from torch_semantic_segmentation_tpu.ops.conv import ConvBNAct


def fold_conv_bn_act(block: ConvBNAct) -> bool:
    """Fold one ConvBNAct in place. Returns False if already folded."""
    if block.bn is None:
        return False
    bn = block.bn
    if not bn.use_running_average:
        raise ValueError("call model.eval() before folding BatchNorm")
    scale = bn.scale[...] / jnp.sqrt(bn.var[...] + bn.epsilon)
    kernel = block.conv.kernel[...]
    block.conv.kernel[...] = kernel * scale  # broadcast over out-channel
    bias = block.conv.bias[...] if block.conv.bias is not None else 0.0
    new_bias = bn.bias[...] + (bias - bn.mean[...]) * scale
    if block.conv.bias is not None:
        block.conv.bias[...] = new_bias
    else:
        block.conv.bias = nnx.Param(new_bias)
        block.conv.use_bias = True
    block.bn = None
    return True


def fold_batchnorm(model: nnx.Module) -> int:
    """Fold every ConvBNAct in the tree; returns the folded-block count."""
    count = 0
    seen = set()

    def walk(mod):
        nonlocal count
        if id(mod) in seen:
            return
        seen.add(id(mod))
        if isinstance(mod, ConvBNAct):
            if fold_conv_bn_act(mod):
                count += 1
        for name, value in vars(mod).items():
            if name.startswith("_"):
                continue
            if isinstance(value, nnx.Module) and not isinstance(value, nnx.List):
                walk(value)
            elif isinstance(value, (nnx.List, list, tuple)):
                for item in value:
                    if isinstance(item, nnx.Module):
                        walk(item)

    walk(model)
    return count
