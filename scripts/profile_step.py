#!/usr/bin/env python
"""Profile the protocol training step on TPU (round-4 perf work).

Reuses the bench's converged-state cache (results/bench_state) to build
the exact phase-B program, runs a few steps under jax.profiler, and
prints the top self-time ops from the trace so the hash/march/composite
cost split is measured rather than estimated.

Usage: python scripts/profile_step.py [--steps 3] [--otype HashGrid]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def summarize_trace(trace_dir, top=40):
    """Parse the .trace.json.gz and aggregate device op self-times."""
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace found", file=sys.stderr)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid names containing 'TPU' and 'XLA Op' like tracks
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    totals = {}
    meta = {}
    wall = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = tid_names.get((e.get("pid"), e.get("tid")), "")
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        if "XLA Op" not in tname and "Steps" not in tname:
            continue
        if "XLA Op" in tname:
            name = e.get("name", "?")
            dur = float(e.get("dur", 0.0))
            totals[name] = totals.get(name, 0.0) + dur
            wall += dur
            args = e.get("args")
            if args and name not in meta:
                # op provenance: XLA records the HLO long name / source
                # op under assorted arg keys depending on version
                desc = (args.get("long_name") or args.get("tf_op")
                        or args.get("source") or args.get("hlo_op")
                        or "")
                if desc:
                    meta[name] = str(desc)[:160]
    items = sorted(totals.items(), key=lambda kv: -kv[1])
    print(f"total device op time: {wall/1e6:.2f}s over "
          f"{len(items)} distinct ops (trace {os.path.basename(path)})")
    for name, dur in items[:top]:
        print(f"{dur/1e6:8.3f}s  {100*dur/max(wall,1e-9):5.1f}%  {name}"
              + (f"  | {meta[name]}" if name in meta else ""))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--otype", default=None)
    parser.add_argument("--trace-dir", default="/tmp/denerf_profile")
    parser.add_argument("--summarize-only", default=None,
                        help="just summarize an existing trace dir")
    parser.add_argument("--top", type=int, default=40)
    args = parser.parse_args()

    if args.summarize_only:
        summarize_trace(args.summarize_only, args.top)
        return

    # reuse bench phase-B construction: bench.main() traces ONLY its
    # timed loop when DENERF_BENCH_PROFILE_DIR is set (phase A hits the
    # durable cache, so this is cheap after the first bench run)
    os.environ.setdefault("DENERF_BENCH_TIMED_STEPS", str(args.steps))
    os.environ["DENERF_BENCH_PROFILE_DIR"] = args.trace_dir
    if args.otype:
        os.environ["DENERF_BENCH_OTYPE"] = args.otype

    import bench

    bench.main()
    time.sleep(2)
    summarize_trace(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
