"""Pooling ops: max/avg pool, max-pool-with-indices + max-unpool (ENet),
adaptive average pooling (ASPP / PPM image-level context).

TPU-native design notes (SURVEY.md §2.2 "Max-pool with indices"):
torch returns *global flattened* argmax indices and MaxUnpool2d scatters by
them. A scatter is hostile to the TPU vector unit, so instead we keep the
argmax *within each 2×2 window* (which carries the same information for the
pool→unpool pairing ENet uses) and reconstruct via a one-hot multiply — a
fully vectorised reshape/select with no scatter, and it differentiates
cleanly. Tie-breaking matches torch (first/lowest index wins).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx


def max_pool2d(x: jax.Array, window: int = 2, stride: int | None = None,
               padding: int = 0) -> jax.Array:
    """Max pool, NHWC; torch MaxPool2d parity for symmetric int padding."""
    stride = stride or window
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max, (1, window, window, 1), (1, stride, stride, 1), pads)


def avg_pool2d(x: jax.Array, window: int = 2, stride: int | None = None,
               padding: int = 0) -> jax.Array:
    """Average pool, NHWC (count includes padding=False semantics not needed:
    the zoo only uses unpadded avg pools)."""
    stride = stride or window
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    s = jax.lax.reduce_window(x.astype(jnp.float32), 0.0, jax.lax.add,
                              (1, window, window, 1), (1, stride, stride, 1), pads)
    return (s / (window * window)).astype(x.dtype)


def max_pool2x2_with_indices(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """2×2/s2 max pool returning (pooled, window_argmax ∈ [0,4) int32).

    Window index is row-major within the 2×2 window (torch ordering), so the
    (pooled, indices) pair round-trips through `max_unpool2x2` exactly like
    torch's MaxPool2d(return_indices=True) → MaxUnpool2d.
    Requires even H, W (ENet pads inputs to multiples of 8 anyway).
    """
    n, h, w, c = x.shape
    xr = x.reshape(n, h // 2, 2, w // 2, 2, c)
    xr = xr.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4, c)
    idx = jnp.argmax(xr, axis=3).astype(jnp.int32)
    val = jnp.max(xr, axis=3)
    return val, idx


def max_unpool2x2(x: jax.Array, indices: jax.Array) -> jax.Array:
    """Place each value at its recorded position within the 2×2 output window.

    One-hot multiply instead of scatter: differentiable, vectorised, MXU/VPU
    friendly. `indices` comes from `max_pool2x2_with_indices` (possibly from
    a *different* tensor, as in ENet's encoder→decoder index forwarding).
    """
    n, h2, w2, c = x.shape
    oh = jax.nn.one_hot(indices, 4, axis=3, dtype=x.dtype)  # (n,h2,w2,4,c)
    y = x[:, :, :, None, :] * oh
    y = y.reshape(n, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, h2 * 2, w2 * 2, c)


def global_avg_pool(x: jax.Array, keepdims: bool = True) -> jax.Array:
    """Image-level pooling (ASPP / attention branches). fp32 accumulate."""
    y = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=keepdims)
    return y.astype(x.dtype)


def adaptive_avg_pool2d(x: jax.Array, output_size: int | tuple[int, int]) -> jax.Array:
    """torch AdaptiveAvgPool2d parity for the bin sizes PPM uses.

    torch computes bin b as mean over [floor(b*H/B), ceil((b+1)*H/B)); for the
    PPM bins (1,2,3,6) on zoo feature maps we implement it generally with a
    per-bin averaging matrix applied as two small matmuls (like resize).
    """
    if isinstance(output_size, int):
        oh = ow = output_size
    else:
        oh, ow = output_size
    n, h, w, c = x.shape
    if (oh, ow) == (h, w):
        return x

    import numpy as np

    def pool_matrix(in_size: int, out_size: int) -> jnp.ndarray:
        m = np.zeros((out_size, in_size), dtype=np.float32)
        for b in range(out_size):
            lo = (b * in_size) // out_size
            hi = -(-((b + 1) * in_size) // out_size)  # ceil
            m[b, lo:hi] = 1.0 / (hi - lo)
        return jnp.asarray(m)

    mh, mw = pool_matrix(h, oh), pool_matrix(w, ow)
    hp = jax.lax.Precision.HIGHEST   # fp32 parity on the MXU (see upsample.py)
    y = jnp.einsum("nhwc,oh->nowc", x.astype(jnp.float32), mh, precision=hp)
    y = jnp.einsum("nhwc,ow->nhoc", y, mw, precision=hp)
    return y.astype(x.dtype)
