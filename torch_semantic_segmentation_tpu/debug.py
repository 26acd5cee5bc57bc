"""Numeric sanitisation (SURVEY.md §5 "Race detection/sanitizers").

The framework is single-controller and functional, so there are no data
races to detect; the failure mode that replaces them is numeric — NaN/Inf
from bf16 overflow, bad LR, or ignore-index mishandling. Two tools:

- `enable_nan_debugging()` — flips `jax.debug_nans`/`jax_debug_infs`: the
  first NaN-producing primitive re-runs un-jitted and raises with a stack
  trace pointing at the op.
- `checked_step(step_fn)` — wraps a train step with `checkify` so NaN/Inf
  in the *outputs* (loss, grads already folded into params) raise a checked
  error with payload, without de-optimising the compiled program.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)


def checked_step(step_fn: tp.Callable) -> tp.Callable:
    """Wrap `step_fn(state, *args) -> (state, metrics)`: raises
    `checkify.JaxRuntimeError` when the loss goes non-finite."""

    def inner(state, *args):
        new_state, metrics = step_fn(state, *args)
        loss = metrics["loss"] if isinstance(metrics, dict) else metrics
        checkify.check(jnp.isfinite(loss), "non-finite loss {l}", l=loss)
        return new_state, metrics

    checked = checkify.checkify(inner)

    def wrapped(state, *args):
        err, out = checked(state, *args)
        err.throw()
        return out

    return wrapped
