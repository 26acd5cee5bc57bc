"""Per-HLO attribution: join device-trace events with the optimized-HLO
module (round-5 tooling; VERDICT r4 next #1).

`trace_ops.py` aggregates device time per op FAMILY ("fusion", "convert",
"copy") — enough to say "57% generic fusions" (the UNet finding,
docs/FULLRES_ROOFLINE.md) but not WHAT each fusion computes. This script
closes that gap: it AOT-compiles the same step, captures the optimized
HLO text, traces N steps, and for every hot *individual* instruction
prints

  ms/step  %   name   kind  out-shape   opcode histogram   bytes  GB/s

where `bytes` is the fusion's operand+output footprint parsed from the
HLO shapes (a lower bound on its HBM traffic — scalars/broadcasts are
cheap, but a big tensor read twice still counts once) and GB/s is that
footprint over the measured time: fusions far below the ~819 GB/s HBM
peak are compute/relayout-bound inside, not streaming — those are the
attack surface.

Usage (TPU host):
    python scripts/diag_hlo_attr.py --model unet --batch 8
    python scripts/diag_hlo_attr.py --mode fullres --top 25
    python scripts/diag_hlo_attr.py --model unet --dump-hlo /tmp/unet.hlo

Reference counterpart: none — the reference profiles with nvprof/torch
profiler per-CUDA-kernel; this is the XLA-native equivalent (SURVEY.md
§5 "Tracing/profiling" row).
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_ops import device_pid_events, load_trace_events  # noqa: E402

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(text: str) -> int:
    """Sum the byte sizes of every tensor shape literal in `text`
    (handles tuple shapes by summing members)."""
    total = 0
    for dtype, dims in SHAPE_RE.findall(text):
        if dtype not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dtype]
    return total


# "  %name = shape op(operands), kw=..., calls=%comp". Tuple shapes
# contain nested parens from layout annotations — (f32[128]{0:T(128)S(1)},
# ...) — so the shape alternative allows one nesting level.
INSTR_RE = re.compile(
    r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*"
    r"(\((?:[^()]|\([^()]*\))*\)|\S+)\s+([\w\-]+)\(")
CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")
KIND_RE = re.compile(r"kind=k(\w+)")
COMP_RE = re.compile(r"^%?([\w.\-]+)\s+(?:\([^)]*\))?.*\{\s*$")
OPERAND_RE = re.compile(r"%([\w.\-]+)")


def parse_hlo(text: str):
    """Return (instrs, comps): instrs maps instruction name ->
    dict(shape, op, kind, calls, operands, line); comps maps computation
    name -> list of (op, shape) for its body instructions."""
    instrs: dict[str, dict] = {}
    comps: dict[str, list] = {}
    cur: list | None = None
    for line in text.splitlines():
        m = COMP_RE.match(line)
        if m and "{" in line and "=" not in line.split("{")[0]:
            cur = comps.setdefault(m.group(1), [])
            continue
        if line.startswith("}"):
            cur = None
            continue
        im = INSTR_RE.match(line)
        if not im:
            continue
        name, shape, op = im.groups()
        if cur is not None:
            cur.append((op, shape))
        # operand names: between the opcode's "(" and its matching ")"
        # (operand lists are flat names/comments, no nested parens)
        rest = line[im.end():]
        arglist = rest.split(")", 1)[0]
        d = {"shape": shape, "op": op, "line": line.strip(),
             "operands": OPERAND_RE.findall(arglist)}
        km = KIND_RE.search(line)
        if km:
            d["kind"] = km.group(1)
        cm = CALLS_RE.search(line)
        if cm:
            d["calls"] = cm.group(1)
        instrs[name] = d
    return instrs, comps


def op_histogram(body: list, top: int = 5) -> str:
    skip = {"parameter", "constant", "tuple", "get-tuple-element"}
    cnt = collections.Counter(op for op, _ in body if op not in skip)
    return " ".join(f"{o}:{n}" for o, n in cnt.most_common(top))


def footprint_bytes(d: dict, instrs: dict) -> int:
    """Fusion footprint: output bytes + each distinct operand's bytes,
    operand shapes resolved through the instruction map."""
    total = shape_bytes(d["shape"])
    for name in dict.fromkeys(d.get("operands", ())):
        src = instrs.get(name)
        if src is not None:
            total += shape_bytes(src["shape"])
    return total


def classify(d: dict | None, body: list, name: str) -> str:
    """Coarse per-component category for the rollup table."""
    if d is None:
        return "untracked"
    ops = collections.Counter(op for op, _ in body) if body else \
        collections.Counter({d["op"]: 1})
    if d["op"] == "custom-call":
        return "pallas-kernel"
    if d["op"] in ("copy", "reverse", "transpose", "bitcast"):
        return "relayout-copy"
    if "convolution" in ops:
        out = d["shape"]
        # weight-gradient convs write kernel-shaped f32 outputs
        if re.match(r"\(?f32\[[0-9]+,[0-9]+,", out) and "768" not in out \
                and "reduce" not in ops:
            return "conv-wgrad+update" if "add" in ops and "multiply" in ops \
                else "conv-wgrad"
        if "reduce" in ops:
            return "conv+bn-stat"
        return "conv"
    if "reduce" in ops:
        return "bn-stat/grad-reduce"
    if "rng" in name or "shift-right-logical" in ops:
        return "rng"
    if ops and not (set(ops) - {"broadcast", "convert", "multiply", "add",
                                "subtract", "select", "compare", "clamp",
                                "maximum", "minimum", "copy", "slice",
                                "exp", "divide", "and", "reshape"}):
        return "elementwise"
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["fullres", "crop"], default=None)
    ap.add_argument("--model", default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--crop", type=int, default=None)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--dump-hlo", default=None,
                    help="also write the optimized HLO text here")
    ap.add_argument("--grep", default=None,
                    help="print the full HLO body of instructions whose "
                         "name matches this regex, then exit")
    args = ap.parse_args()

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
    elif args.mode == "crop":
        crop = args.crop or bench.CROP
        jstep, state = bench.build_step((crop, crop), bench.REMAT)
        batch = args.batch or bench.CROP_BATCH
        label = f"mode=crop crop={crop}"
    else:
        jstep, state = bench.build_step(
            (bench.HEIGHT, bench.WIDTH), bench.FULL_REMAT)
        batch = args.batch or bench.FULL_BATCH
        label = "mode=fullres"

    rng = np.random.default_rng(0)
    ri = jnp.asarray(rng.integers(
        0, 256, (batch, bench.HEIGHT, bench.WIDTH, 3), dtype=np.uint8))
    rl = jnp.asarray(rng.integers(
        0, 19, (batch, bench.HEIGHT, bench.WIDTH), dtype=np.uint8))
    key = jax.random.key(0)

    lowered = jstep.lower(state, ri, rl, key)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = ca.get("flops", 0.0)
        bytes_ = ca.get("bytes accessed", 0.0)
        print(f"# cost_analysis: {flops / 1e12:.2f} TFLOP/step "
              f"({flops / 197e12 * 1e3:.1f} ms at v5e 197 TFLOP/s bf16 peak), "
              f"{bytes_ / 1e9:.2f} GB accessed "
              f"({bytes_ / 819e9 * 1e3:.1f} ms at 819 GB/s HBM)")
    except Exception as e:                      # pragma: no cover
        print(f"# cost_analysis unavailable: {e}")
    hlo = compiled.as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)
        print(f"# optimized HLO -> {args.dump_hlo} ({len(hlo) / 1e6:.1f} MB)")
    instrs, comps = parse_hlo(hlo)

    if args.grep:
        pat = re.compile(args.grep)
        for name, d in instrs.items():
            if pat.search(name):
                print(d["line"])
                if "calls" in d:
                    print(f"--- {d['calls']} body:")
                    for op, shape in comps.get(d["calls"], []):
                        print(f"    {op:24s} {shape}")
        return

    state, metrics = jstep(state, ri, rl, key)
    float(metrics["loss"])
    logdir = tempfile.mkdtemp(prefix="hlo_attr_")
    with jax.profiler.trace(logdir):
        for _ in range(args.steps):
            key, sub = jax.random.split(key)
            state, metrics = jstep(state, ri, rl, sub)
        float(metrics["loss"])

    events = load_trace_events(logdir)
    track, dev_events = device_pid_events(events)
    agg: collections.Counter = collections.Counter()
    for e in dev_events:
        name = e["name"].strip("%")
        if re.search(r"^$|^\d+$|^jit_|^pjit|^XLA Modules?|^Steps?$", name):
            continue
        agg[name] += e.get("dur", 0)
    total_us = sum(agg.values())
    n = args.steps
    print(f"# {label} b{batch}; device track {track}; "
          f"total {total_us / 1e3 / n:.1f} ms/step over {n} steps")

    # category rollup over ALL events (not just --top): the per-component
    # composition table for docs/FULLRES_ROOFLINE.md
    cats: collections.Counter = collections.Counter()
    cat_bytes: collections.Counter = collections.Counter()
    for name, us in agg.items():
        d = instrs.get(name)
        body = comps.get(d.get("calls", ""), []) if d else []
        cat = classify(d, body, name)
        cats[cat] += us
        if d is not None:
            cat_bytes[cat] += footprint_bytes(d, instrs) * n
    print(f"{'ms/step':>8} {'%':>5}  {'GB/s':>6}  category")
    for cat, us in cats.most_common():
        gbps = cat_bytes[cat] / us / 1e3 if us else 0.0
        print(f"{us / 1e3 / n:8.2f} {100 * us / total_us:5.1f}  "
              f"{gbps:6.0f}  {cat}")
    print()
    print(f"{'ms/step':>8} {'%':>5}  {'GB/s':>6}  name / kind / out / ops")
    shown = 0
    for name, us in agg.most_common():
        if shown >= args.top:
            break
        d = instrs.get(name)
        ms = us / 1e3 / n
        pct = 100 * us / total_us
        if d is None:
            print(f"{ms:8.2f} {pct:5.1f}  {'':>6}  {name}  (not in HLO "
                  f"module — runtime event)")
            shown += 1
            continue
        fb = footprint_bytes(d, instrs)
        gbps = fb / (us / n) / 1e3 if us else 0.0   # bytes/us -> GB/s
        body = comps.get(d.get("calls", ""), [])
        hist = op_histogram(body) if body else d["op"]
        kind = d.get("kind", d["op"])
        print(f"{ms:8.2f} {pct:5.1f}  {gbps:6.0f}  {name}  [{kind}] "
              f"{d['shape']}  {hist}")
        shown += 1


if __name__ == "__main__":
    main()
