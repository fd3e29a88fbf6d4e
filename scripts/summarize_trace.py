"""Summarize a jax.profiler trace: device-op time grouped by op name.

Usage: python scripts/summarize_trace.py /tmp/jaxprof_decode [--top 40]

Reads the perfetto trace.json.gz the profiler writes under
<dir>/plugins/profile/<ts>/*.trace.json.gz, keeps TPU device-track events,
and aggregates wall-time by (sanitized) op name. The "run" classification
buckets ops into coarse categories for roofline reasoning.
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


def load_events(trace_dir: str):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        sys.exit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def device_pids(events):
    """pids whose process_name mentions TPU (device tracks, not host)."""
    pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name:
                pids.add(e["pid"])
    return pids


_SANITIZE = re.compile(r"[.\d]+$")


def bucket(name: str) -> str:
    n = name.lower()
    if "fusion" in n:
        return "fusion"
    for key in ("custom-call", "dot", "conv", "scatter", "gather", "copy",
                "transpose", "reduce", "select", "dynamic", "sort", "rng",
                "broadcast", "iota", "concatenate", "exp", "convert", "add",
                "multiply"):
        if key in n:
            return key
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--like", default=None,
                    help="only ops whose name contains this substring")
    args = ap.parse_args()

    events = load_events(args.trace_dir)
    pids = device_pids(events)
    # self-time: within each (pid, tid) track, subtract the time covered by
    # nested child events (parent spans like `while` otherwise double-count)
    tracks = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids:
            continue
        tracks[(e["pid"], e.get("tid"))].append(e)

    per_op = collections.Counter()
    per_count = collections.Counter()
    per_bucket = collections.Counter()
    total = 0.0
    for evs in tracks.values():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (end_ts, child_time_accum_index)
        child_time = [0.0] * len(evs)
        order = []
        for idx, e in enumerate(evs):
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and stack[-1][0] <= ts:
                stack.pop()
            if stack:
                child_time[stack[-1][1]] += dur
            stack.append((ts + dur, idx))
            order.append(idx)
        for idx in order:
            e = evs[idx]
            name = e.get("name", "?")
            if args.like and args.like not in name:
                continue
            self_dur = max(e.get("dur", 0) - child_time[idx], 0) / 1e3  # ms
            key = _SANITIZE.sub("", name)
            per_op[key] += self_dur
            per_count[key] += 1
            per_bucket[bucket(name)] += self_dur
            total += self_dur

    print(f"total device op time: {total:.2f} ms")
    print("\n-- by bucket --")
    for k, v in per_bucket.most_common():
        print(f"{v:10.2f} ms  {100*v/max(total,1e-9):5.1f}%  {k}")
    print(f"\n-- top {args.top} ops (self time) --")
    for k, v in per_op.most_common(args.top):
        print(f"{v:10.2f} ms  {100*v/max(total,1e-9):5.1f}%  x{per_count[k]:<6d} {k[:100]}")


if __name__ == "__main__":
    main()
