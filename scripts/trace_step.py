"""Per-op device-time trace of a train step (PERF.md methodology).

Runs N fenced warm steps, wraps a few steps in ``jax.profiler.trace``
(works through the axon relay — r3 finding), then rolls the device-lane
events up into named buckets so PERF.md tables can cite HLO-attributed
ms/step instead of guesses.

Usage (background shell, ≥10 min budget — TPU compiles are relay-bound):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_step.py \
        --case maskrcnn --logdir /tmp/trace_mr

Cases mirror bench.py setups exactly (same shapes, same optimizer).
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_case(name: str):
    import jax

    from bench import _det_targets
    from cvpytorch_tpu.config import CommonConfiguration
    from cvpytorch_tpu.optim.optimizers import build_optimizer
    from cvpytorch_tpu.optim.schedules import build_lr_scheduler
    from cvpytorch_tpu.registry import MODELS
    import cvpytorch_tpu.models  # noqa: F401

    rng = np.random.RandomState(0)
    on_tpu = jax.default_backend() == "tpu"
    if name == "maskrcnn":
        B, HW = (8, 800) if on_tpu else (1, 96)
        model = MODELS.get("MaskRCNN")(
            dictionary=tuple({f"c{i}": 1.0} for i in range(4)))
        batch = {"image": (rng.rand(B, HW, HW, 3) * 255).astype(np.uint8),
                 "target": _det_targets(rng, B, 16, HW, with_masks=True)}
    elif name == "yolov5":
        B, HW = (128, 640) if on_tpu else (4, 64)
        model = MODELS.get("YOLOv5")(
            dictionary=tuple({f"c{i}": 1.0} for i in range(80)),
            model_cfg=CommonConfiguration(
                {"TYPE": "yolov5_s" if on_tpu else "yolov5_n",
                 "LOSS": {"name": "YOLOv5Loss"}}))
        batch = {"image": (rng.rand(B, HW, HW, 3) * 255).astype(np.uint8),
                 "target": _det_targets(rng, B, 32, HW, n=8)}
    else:
        raise SystemExit(f"unknown case {name!r}")

    tcfg = CommonConfiguration({
        "INIT_LR": 0.01, "N_MAX_EPOCHS": 300,
        "OPTIMIZER": {"TYPE": "SGD", "MOMENTUM": 0.9},
        "LR_SCHEDULER": {"TYPE": "CosineAnnealingLR"},
    })
    tx = build_optimizer(tcfg, build_lr_scheduler(tcfg, 100))
    return model, tx, batch, B


def classify(name: str, long_name: str) -> str:
    """Bucket an HLO op by what it actually computes (long_name-aware)."""
    ln = long_name or ""
    base = re.sub(r"[.\d]+$", "", name)
    if "convolution" in name or "convolution" in ln.split("=")[0]:
        return "conv"
    if base.startswith("fusion") or base.startswith("loop_"):
        if "convolution" in ln:
            return "conv-fusion"
        if "scatter" in ln:
            return "scatter-fusion"
        if "gather" in ln:
            return "gather-fusion"
        if "reduce-window" in ln:
            return "reduce-window-fusion"
        if "convert" in ln and "reduce" in ln:
            return "convert-reduce-fusion"
        if "reduce" in ln:
            return "reduce-fusion"
        if "iota" in ln or "broadcast" in ln:
            return "broadcast-fusion"
        return "elementwise-fusion"
    if base.startswith("custom-call"):
        return "custom-call(pallas/sort)"
    for k in ("sort", "copy", "gather", "scatter", "reduce-window",
              "select-and-scatter", "transpose", "reshape", "bitcast",
              "dynamic-slice", "dynamic-update-slice", "while", "all-reduce",
              "rng", "convert", "broadcast", "iota", "concatenate", "slice",
              "pad", "reduce", "select", "compare", "add", "multiply"):
        if base.startswith(k):
            return k
    return base or "other"


def rollup(logdir: str, steps: int):
    paths = glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace files under {logdir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pname = {}
    tname = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tname[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")
    dev_pids = {p for p, n in pname.items()
                if "TPU" in n.upper() or "/device:" in n}
    print(f"# trace {os.path.basename(path)}; device pids: "
          f"{[pname[p] for p in sorted(dev_pids)]}", flush=True)

    buckets = defaultdict(float)
    ops = defaultdict(float)
    op_example = {}
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tn = tname.get((e.get("pid"), e.get("tid")), "")
        # XLA op lanes only (skip step/scope lanes which double-count)
        if tn and ("step" in tn.lower() or "scope" in tn.lower()):
            continue
        dur = e.get("dur", 0) / 1e3  # µs → ms
        name = e.get("name", "?")
        ln = (e.get("args") or {}).get("long_name", "")
        b = classify(name, ln)
        buckets[b] += dur
        ops[name] += dur
        if name not in op_example and ln:
            op_example[name] = ln[:220]
        total += dur

    print(f"\n## bucket rollup (ms/step over {steps} profiled steps; "
          f"total device {total / steps:.1f} ms/step)")
    for b, ms in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{ms / steps:9.2f} ms  {b}")
    print("\n## top 40 ops")
    for n, ms in sorted(ops.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms / steps:9.2f} ms  {n}  :: {op_example.get(n, '')}")
    return buckets, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="maskrcnn")
    ap.add_argument("--logdir", default="/tmp/trace_step")
    ap.add_argument("--warm", type=int, default=10)
    ap.add_argument("--profile-steps", type=int, default=3)
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--no-trace", action="store_true",
                    help="timing-only A/B run: skip the profiler capture")
    args = ap.parse_args()

    if args.parse_only:
        rollup(args.logdir, args.profile_steps)
        return

    import jax

    from cvpytorch_tpu.parallel.mesh import create_mesh, shard_batch
    from cvpytorch_tpu.train_state import create_train_state, make_train_step

    model, tx, batch, B = build_case(args.case)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch,
                               use_ema=False)
    train_step = make_train_step(amp=True)
    sb = shard_batch(create_mesh(), batch)

    t0 = time.perf_counter()
    state, metrics = train_step(state, sb)
    float(metrics["loss"])  # value fetch = the only reliable fence on axon
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", flush=True)

    # the SECOND execution pays a one-off relay flush (measured 57 s on the
    # maskrcnn case, r5 probe) — fence it out of the timed window too
    t0 = time.perf_counter()
    state, metrics = train_step(state, sb)
    float(metrics["loss"])
    print(f"second step (relay flush): {time.perf_counter() - t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    for _ in range(args.warm):
        state, metrics = train_step(state, sb)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    print(f"warm: {dt / args.warm * 1e3:.1f} ms/step "
          f"({args.warm * B / dt:.2f} img/s)", flush=True)

    if args.no_trace:
        return

    with jax.profiler.trace(args.logdir):
        for _ in range(args.profile_steps):
            state, metrics = train_step(state, sb)
        float(metrics["loss"])

    rollup(args.logdir, args.profile_steps)


if __name__ == "__main__":
    main()
