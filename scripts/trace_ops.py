"""Device-trace op aggregation for the bench step (round-3 tooling).

docs/FULLRES_ROOFLINE.md's round-3 sections attribute step time from
`jax.profiler.trace` device traces ("fused CE loss ~24 ms, MBConv ~17 ms,
packed-LDS ~30 ms, ..."). This script is the committed form of that
aggregation so the numbers are reproducible: it traces N steps of the
bench tier, parses the trace-viewer JSON, and prints per-op-family device
time per step.

Usage (on the TPU host):
    python scripts/trace_ops.py                 # fullres tier, b48
    python scripts/trace_ops.py --mode crop     # crop-1024 tier
    BENCH_FULL_BATCH=40 python scripts/trace_ops.py --steps 4 --top 40

Families: XLA emits `fusion.123`, `copy.5`, `custom-call.7` etc.; events
are grouped by name with trailing `.N`/`_N` indices stripped, and the
`--raw` flag keeps the ungrouped top events (useful to find ONE hot
fusion and then dump it with scripts/diag_head_hlo.py-style HLO greps).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_trace_events(logdir: str) -> list[dict]:
    paths = glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        return json.load(f)["traceEvents"]


def device_pid_events(events: list[dict]) -> tuple[str, list[dict]]:
    """Pick the pid with the largest total complete-event duration whose
    process name looks like a device TensorCore track (fall back to the
    busiest non-python pid so the script degrades readably)."""
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    totals = collections.Counter()
    for e in events:
        if e.get("ph") == "X":
            totals[e["pid"]] += e.get("dur", 0)
    device_pids = [p for p, n in names.items()
                   if re.search(r"TPU|TensorCore|/device:", n or "")]
    pool = device_pids or [p for p in totals
                           if "python" not in (names.get(p, "").lower())]
    if not pool:
        pool = list(totals)
    pid = max(pool, key=lambda p: totals[p])
    return names.get(pid, str(pid)), [
        e for e in events if e.get("ph") == "X" and e["pid"] == pid]


FAMILY_RE = re.compile(r"[._-]?\d+$")


def family(name: str) -> str:
    return FAMILY_RE.sub("", name.strip("%"))


CONTAINER_RE = re.compile(r"^$|^\d+$|^jit_|^pjit|^XLA Modules?|^Steps?$")


def aggregate(events: list[dict], raw: bool = False) -> collections.Counter:
    """Sum complete-event durations per op family, skipping container
    events (the module-level `jit_step(...)` span and the unnamed
    per-step parents) that nest the per-op events and would double-count."""
    out = collections.Counter()
    for e in events:
        name = e["name"].strip("%")
        if CONTAINER_RE.search(name):
            continue
        out[name if raw else family(name)] += e.get("dur", 0)  # microseconds
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["fullres", "crop"], default="fullres")
    ap.add_argument("--model", default=None,
                    help="trace any zoo model's train step instead of the "
                         "bench FastSCNN tiers (768² crop aug from full-res, "
                         "CE aux-weighted — scripts/bench_train_zoo.py's "
                         "configuration); --mode is ignored")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--crop", type=int, default=None)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--raw", action="store_true",
                    help="ungrouped event names (find a single hot fusion)")
    ap.add_argument("--logdir", default=None,
                    help="parse an existing trace dir instead of running")
    args = ap.parse_args()

    logdir = args.logdir
    if logdir is None:
        import jax
        import jax.numpy as jnp
        import numpy as np

        import bench

        if args.model is not None:
            from bench_train_zoo import CROP as ZCROP
            from bench_train_zoo import build_zoo_step
            crop = args.crop or ZCROP
            batch = args.batch or 16
            jstep, state = build_zoo_step(args.model, crop)
            label = f"model={args.model} crop={crop}"
        elif args.mode == "fullres":
            hw, batch, remat = (bench.HEIGHT, bench.WIDTH), \
                bench.FULL_BATCH, bench.FULL_REMAT
            jstep, state = bench.build_step(hw, remat)
            batch = args.batch or batch
            label = f"mode={args.mode}"
        else:
            crop = args.crop or bench.CROP
            hw, batch, remat = (crop, crop), bench.CROP_BATCH, bench.REMAT
            jstep, state = bench.build_step(hw, remat)
            batch = args.batch or batch
            label = f"mode={args.mode} crop={crop}"
        rng = np.random.default_rng(0)
        ri = jnp.asarray(rng.integers(
            0, 256, (batch, bench.HEIGHT, bench.WIDTH, 3), dtype=np.uint8))
        rl = jnp.asarray(rng.integers(
            0, 19, (batch, bench.HEIGHT, bench.WIDTH), dtype=np.uint8))
        key = jax.random.key(0)
        state, metrics = jstep(state, ri, rl, key)    # compile + warm
        float(metrics["loss"])

        logdir = tempfile.mkdtemp(prefix="trace_ops_")
        with jax.profiler.trace(logdir):
            for _ in range(args.steps):
                key, sub = jax.random.split(key)
                state, metrics = jstep(state, ri, rl, sub)
            float(metrics["loss"])
        print(f"# trace: {logdir}  {label} b{batch} "
              f"steps={args.steps}")

    events = load_trace_events(logdir)
    track, dev_events = device_pid_events(events)
    agg = aggregate(dev_events, raw=args.raw)
    total_us = sum(agg.values())
    n = args.steps
    if args.logdir is not None:
        print(f"# NOTE: parsing an existing trace — per-step numbers divide "
              f"by --steps={n}; pass the step count the trace was taken with")
    print(f"# device track: {track}; total {total_us / 1e3 / n:.1f} ms/step "
          f"over {n} steps")
    print(f"{'ms/step':>9}  {'%':>5}  op family")
    for name, us in agg.most_common(args.top):
        print(f"{us / 1e3 / n:9.2f}  {100 * us / total_us:5.1f}  {name}")


if __name__ == "__main__":
    main()
