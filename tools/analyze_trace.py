#!/usr/bin/env python
"""Analyze a jax.profiler trace (the .trace.json.gz written under
<dir>/plugins/profile/*/): per-op device time, byte traffic, and the
roofline summary that drove the round-2 engine decisions (BENCH_NOTES.md).

Usage:
  python tools/analyze_trace.py <trace_dir_or_gz> [--steps N] [--top K]

<trace_dir_or_gz> may be the directory passed to jax.profiler.trace /
BENCH_PROFILE or a direct path to vm.trace.json.gz. --steps divides totals
into per-step figures (e.g. rounds x steps_per_round).
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


def load_events(path: str):
    if os.path.isdir(path):
        hits = glob.glob(os.path.join(path, "plugins/profile/*/*.trace.json.gz"))
        if not hits:
            sys.exit(f"no trace.json.gz under {path}")
        path = sorted(hits)[-1]
    with gzip.open(path) as fh:
        return json.load(fh)["traceEvents"], path


def device_ops(events):
    """Yield leaf XLA ops of the device 'XLA Ops' track (pid/tid resolved
    from trace metadata; outer while loops excluded to avoid double
    counting)."""
    pid = None
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in (e["args"].get("name") or ""):
                pid = e["pid"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name")
    if pid is None:
        sys.exit("no TPU device track in trace")
    tid = next((t for (p, t), n in tids.items()
                if p == pid and n == "XLA Ops"), None)
    for e in events:
        if (e.get("ph") == "X" and e["pid"] == pid and e["tid"] == tid
                and not e["name"].startswith("while.")):
            yield e


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("--steps", type=int, default=1,
                    help="divide totals by this step count")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    events, path = load_events(args.trace)
    by_cat = collections.Counter()
    by_cat_b = collections.Counter()
    by_src = collections.Counter()
    by_src_b = collections.Counter()
    by_op = collections.Counter()
    tot_d = tot_b = tot_f = 0
    for e in device_ops(events):
        a = e.get("args") or {}
        d = e.get("dur", 0)
        b = int(a.get("raw_bytes_accessed", 0) or 0)
        f = int(a.get("model_flops", 0) or 0)
        tot_d += d
        tot_b += b
        tot_f += f
        cat = a.get("hlo_category", "?")
        by_cat[cat] += d
        by_cat_b[cat] += b
        src = a.get("source", "?")
        by_src[src] += d
        by_src_b[src] += b
        t = a.get("tf_op", "?")
        m = re.search(r"(block\d+_\d+/\w+|stem_\w+|head_\w+)", t)
        bwd = "bwd" if "transpose(jvp" in t else "fwd"
        by_op[bwd + "::" + (m.group(1) if m else
                            re.sub(r".*closed_call/", "", t)[:55])] += d

    S = max(1, args.steps)
    print(f"trace: {path}")
    print(f"device leaf time: {tot_d/1e3:.1f} ms total, {tot_d/S/1e3:.2f} ms/step")
    print(f"bytes accessed:   {tot_b/1e9:.2f} GB total, {tot_b/S/1e9:.3f} GB/step")
    print(f"model flops:      {tot_f/1e9:.1f} G total")
    if tot_d:
        print(f"achieved BW:      {tot_b/(tot_d*1e-6)/1e9:.0f} GB/s; "
              f"compute: {tot_f/(tot_d*1e-6)/1e12:.1f} TFLOP/s")
    for title, (ctr, bctr) in {
        "by hlo_category": (by_cat, by_cat_b),
        "by source": (by_src, by_src_b),
    }.items():
        print(f"\n== {title} (ms/step, GB/step) ==")
        for k, d in ctr.most_common(args.top):
            print(f"{d/S/1e3:8.2f} {bctr[k]/S/1e9:7.3f}  {k}")
    print(f"\n== by layer/op (ms/step) ==")
    for k, d in by_op.most_common(args.top):
        print(f"{d/S/1e3:8.3f}  {k}")


if __name__ == "__main__":
    main()
