"""Deep-dive analyzer for jax.profiler traces (XLA-Ops track only).

Unlike summarize_trace.py (which mixes the Steps/Modules tracks into the
total and therefore double-counts the program span), this reads ONLY the
"XLA Ops" device track, so the total is true device busy time. Per-op
rows carry shapes (from long_name), bytes_accessed and model_flops, which
makes the roofline split (GEMM vs bandwidth vs overhead) direct.

Usage:
  python scripts/analyze_trace.py /tmp/jaxprof_train_base [--top 30]
      [--like copy] [--detail]  # --detail: individual ops, not grouped
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


def load(trace_dir: str):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        sys.exit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)["traceEvents"]


_SAN = re.compile(r"[.\d]+$")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--like", default=None)
    ap.add_argument("--detail", action="store_true",
                    help="rank individual ops (with shapes) instead of groups")
    args = ap.parse_args()

    events = load(args.trace_dir)
    threads = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e["pid"], e.get("tid"))] = e["args"]["name"]

    ops = []
    steps = []
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = threads.get((e["pid"], e.get("tid")), "")
        if tname == "XLA Ops":
            ops.append(e)
        elif tname == "Steps":
            steps.append(e)

    if steps:
        durs = [s["dur"] / 1e3 for s in steps]
        print(f"steps: {len(durs)}  mean {sum(durs)/len(durs):.2f} ms  "
              f"{[round(d,1) for d in durs]}")

    total = sum(e["dur"] for e in ops) / 1e3
    # busy time as interval union (async copy-start/done can nest/overlap)
    ivs = sorted((e["ts"], e["ts"] + e["dur"]) for e in ops)
    busy, cur_s, cur_e = 0.0, None, None
    for s, t in ivs:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s, t
        else:
            cur_e = max(cur_e, t)
    if cur_e is not None:
        busy += cur_e - cur_s
    busy /= 1e3
    print(f"device: op-time-sum {total:.2f} ms   busy(union) {busy:.2f} ms")

    by_cat = collections.Counter()
    cat_flops = collections.Counter()
    cat_bytes = collections.Counter()
    for e in ops:
        a = e.get("args", {})
        cat = a.get("hlo_category", "?")
        by_cat[cat] += e["dur"] / 1e3
        cat_flops[cat] += int(a.get("model_flops", 0) or 0)
        cat_bytes[cat] += int(a.get("raw_bytes_accessed", 0) or 0)
    print("\n-- by hlo_category (dur / TFLOPS / GB/s while active) --")
    for k, v in by_cat.most_common():
        tf = cat_flops[k] / max(v, 1e-9) / 1e9   # flops/ms -> TFLOPS
        bw = cat_bytes[k] / max(v, 1e-9) / 1e6   # bytes/ms -> GB/s
        print(f"{v:10.2f} ms  {100*v/max(total,1e-9):5.1f}%  "
              f"{tf:7.1f} TF/s {bw:7.0f} GB/s  {k}")

    agg = collections.defaultdict(lambda: [0.0, 0, 0, 0, ""])
    for e in ops:
        name = e.get("name", "?")
        if args.like and args.like not in name:
            continue
        a = e.get("args", {})
        key = name if args.detail else _SAN.sub("", name)
        row = agg[key]
        row[0] += e["dur"] / 1e3
        row[1] += 1
        row[2] += int(a.get("model_flops", 0) or 0)
        row[3] += int(a.get("raw_bytes_accessed", 0) or 0)
        if not row[4]:
            row[4] = a.get("long_name", "")[:160]
    print(f"\n-- top {args.top} ops --")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:args.top]
    for k, (dur, n, fl, by, long_name) in rows:
        tf = fl / max(dur, 1e-9) / 1e9
        bw = by / max(dur, 1e-9) / 1e6
        print(f"{dur:9.2f} ms x{n:<6d} {tf:7.1f} TF/s {bw:7.0f} GB/s  {k[:60]}")
        if args.detail and long_name:
            print(f"            {long_name}")


if __name__ == "__main__":
    main()
