"""TPU-tuned dropout.

`nnx.Dropout` draws its mask with `jax.random.bernoulli`, i.e. a
threefry2x32 hash per element — pure VPU work that costs ~8.5 ms per
step on the FastSCNN classifier activation at bench scale
(48×128×256×128 bf16; scripts/diag_rng.py). The TPU has a hardware RNG
exposed through XLA's `RngBitGenerator` (JAX's 'rbg' PRNG impl); an
8-bit threshold mask drawn from it costs ~5.6 ms including the apply —
the RNG part itself drops from ~4.6 ms to ~1.7 ms.

`Dropout` below subclasses `nnx.Dropout` (same constructor, same
`.train()`/`.eval()`/`set_mode` behavior, same RngStream bookkeeping)
and swaps ONLY the mask draw: when the fast path is on (TPU backend by
default, `TPU_SEG_RBG_DROPOUT=1/0` overrides) and the mask is large
enough to matter, it derives an 'rbg' key from the stream's key and
compares uint8/uint16 hardware-random bits against a quantized
threshold. The keep probability is quantized to k/256 (or k/65536 when
1/256 steps would distort the requested rate by >1%) and the rescale
uses the QUANTIZED keep probability, so E[output] == input exactly.

Trade-offs, stated honestly:
- rbg bit sequences are deterministic per (key, shape, backend,
  compiled executable) — reproducible runs, remat-safe (same key in
  the recomputed forward ⇒ same bits) — but are NOT guaranteed stable
  across backends, compiler versions, or GSPMD shardings. Threefry
  masks (the default path off-TPU, and the `TPU_SEG_RBG_DROPOUT=0`
  path on it) are sharding-invariant; use that for exact multi-chip
  equality checks. Training quality does not care which device drew
  the mask.
- the realized dropout rate is quantized (≤1% relative error by
  construction); torch's dropout draws float32 uniforms, so the two
  frameworks never produce identical masks anyway (parity tests run
  eval-mode, reference: SURVEY.md §4 oracle strategy).

Reference behavior being matched: torch.nn.Dropout{,2d} semantics as
used by the reference models (SURVEY.md §2.1 — classifier heads at
rate 0.1, ERFNet non-bottleneck blocks at 0.3/0.03, ENet spatial
dropout via broadcast_dims).
"""
from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
from flax import nnx
from jax import lax

# below this many mask elements the threefry cost is noise; stay on the
# parent path (keeps small masks sharding-invariant, e.g. ENet's
# (N,1,1,C) spatial-dropout masks)
_MIN_MASK_ELEMENTS = 1 << 16


def enabled() -> bool:
    """On for TPU backends; TPU_SEG_RBG_DROPOUT=1/0 overrides."""
    env = os.environ.get("TPU_SEG_RBG_DROPOUT")
    if env is not None:
        return env != "0"
    return jax.default_backend() == "tpu"


def _quantized_threshold(keep_prob: float) -> tuple | None:
    """Pick (uint dtype, integer threshold, realized keep prob): the
    coarsest bit width whose k/denom grid hits the requested DROP rate
    within 2% relative (the rate is the regularization strength, so
    the error bound goes on it, not on keep_prob). uint8 covers the
    common rates (0.1 → keep 230/256, realized rate 0.1016; 0.3 →
    0.3008); uint16 covers small ones (0.01, 0.03). The rescale uses
    the realized keep prob, so the output stays exactly unbiased
    either way. Returns None only for degenerate thresholds (rate ~0
    or ~1 beyond uint16 resolution)."""
    rate = 1.0 - keep_prob
    for dtype, denom in ((jnp.uint8, 256), (jnp.uint16, 65536)):
        thresh = round(keep_prob * denom)
        if not 0 < thresh < denom:
            continue
        realized = thresh / denom
        if abs((1.0 - realized) - rate) <= 0.02 * rate:
            return dtype, thresh, realized
    return None


def _as_rbg(key: jax.Array) -> jax.Array:
    """Derive an 'rbg' key (4×uint32 state) from any typed PRNG key.
    Distinct input keys give distinct rbg states, so the stream
    separation that nnx's fold_in(count) provides carries over."""
    if "rbg" in str(jax.random.key_impl(key)).lower():
        return key
    data = jax.random.key_data(key)
    reps = -(-4 // data.shape[-1])
    data4 = jnp.tile(data, reps)[..., :4]
    return jax.random.wrap_key_data(data4, impl="rbg")


def _hw_mask(key, shape, dtype, thresh):
    bits = jax.random.bits(_as_rbg(key), shape, dtype)
    return bits < jnp.asarray(thresh, dtype)


class Dropout(nnx.Dropout):
    """Drop-in for nnx.Dropout with the hardware-RNG mask fast path."""

    def __call__(self, inputs, *, deterministic=None, rngs=None):
        det = deterministic if deterministic is not None else self.deterministic
        if det is None or det or not 0.0 < self.rate < 1.0:
            return super().__call__(
                inputs, deterministic=deterministic, rngs=rngs)

        broadcast_shape = list(inputs.shape)
        for dim in self.broadcast_dims:
            broadcast_shape[dim] = 1
        n_mask = math.prod(broadcast_shape)
        plan = _quantized_threshold(1.0 - self.rate)
        if plan is None or n_mask < _MIN_MASK_ELEMENTS or not enabled():
            return super().__call__(
                inputs, deterministic=deterministic, rngs=rngs)

        stream = rngs if rngs is not None else self.rngs
        if isinstance(stream, nnx.Rngs):
            key = stream[self.rng_collection]()
        elif isinstance(stream, nnx.RngStream):
            key = stream()
        elif isinstance(stream, jax.Array):
            key = stream
        else:
            return super().__call__(
                inputs, deterministic=deterministic, rngs=rngs)

        dtype, thresh, realized_keep = plan
        mask = _hw_mask(key, tuple(broadcast_shape), dtype, thresh)
        mask = jnp.broadcast_to(mask, inputs.shape)
        scale = jnp.asarray(1.0 / realized_keep, inputs.dtype)
        return lax.select(mask, inputs * scale, jnp.zeros_like(inputs))
