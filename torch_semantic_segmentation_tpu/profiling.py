"""Tracing/profiling harness (SURVEY.md §5 "Tracing/profiling").

The reference had nothing beyond tqdm/ignite timers; here:
- `trace(logdir)` — context manager around `jax.profiler.trace` producing a
  TensorBoard-loadable device trace.
- `Walltime` — honest step timing. On this deployment the device runs
  behind a remote-execution tunnel where `block_until_ready` can return
  before execution completes; the only reliable sync is a VALUE fetch, so
  `sync()` pulls one scalar from the pytree (measured: ~31 ms round trip,
  amortised over the timed window).
- `cost_analysis(fn, *args)` — compiled FLOPs / HBM bytes / transcendentals
  per call: the tool that caught the 3× HBM-bytes CE-loss regression.
- `dump_hlo(fn, *args)` — optimised HLO text for kernel review.
"""

from __future__ import annotations

import contextlib
import time
import typing as tp

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Device trace for TensorBoard: `with trace('/tmp/tb'): run_steps()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree: tp.Any) -> float:
    """Force real device completion: fetch one scalar's value. Returns it
    (useful for logging the loss the sync already paid for)."""
    leaf = jax.tree.leaves(tree)[0]
    if leaf.ndim == 0:
        return float(leaf)
    return float(jnp.reshape(leaf, (-1,))[0])


class Walltime:
    """Amortised honest step timing: `with Walltime(n) as w: ...` or the
    functional `measure(step_fn, state, n)` form."""

    def __init__(self, steps: int):
        self.steps = steps
        self.seconds_per_step = float("nan")

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds_per_step = (time.perf_counter() - self._t0) / self.steps
        return False


def measure(step_fn: tp.Callable, state: tp.Any, *args, steps: int = 20,
            warmup: int = 1) -> tuple[float, tp.Any]:
    """Time a state-chained step function with a trailing value fetch.
    Returns (seconds_per_step, final_state)."""
    for _ in range(warmup):
        state = step_fn(state, *args)
    sync(state)
    with Walltime(steps) as w:
        for _ in range(steps):
            state = step_fn(state, *args)
        sync(state)
    return w.seconds_per_step, state


def cost_analysis(fn: tp.Callable, *args, **kwargs) -> dict[str, float]:
    """FLOPs / bytes / transcendentals of the compiled program."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis() or {}
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
        "transcendentals": float(ca.get("transcendentals", 0.0)),
    }


def dump_hlo(fn: tp.Callable, *args, optimized: bool = True, **kwargs) -> str:
    """Optimised (post-fusion) HLO text of the compiled program."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    if not optimized:
        return lowered.as_text()
    return lowered.compile().as_text()


def memory_stats() -> dict[str, int] | None:
    """Live/peak HBM bytes on device 0 (None when the backend hides it)."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return None
    return {k: int(v) for k, v in stats.items()
            if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")}
