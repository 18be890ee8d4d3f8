#!/usr/bin/env python
"""BASELINE ladder: measured throughput for the five configs the driver
metadata names (BASELINE.json "configs", BASELINE.md north-star table):

  1. centralized   EfficientNet-B0 single-client ICH (5-class, batch 8)
  2. fedavg-ich    FedAvg 4-client IID ICH, full labels
  3. fedmlp-s1-ich FedMLP stage-1, 8 task-heterogeneous ICH clients
  4. fedmlp-cxr8   FedMLP two-stage, ChestXray14 geometry (8 kept classes,
                   reference dataset/dataset.py:14-15), 8 clients
  5. flagship-20   20-client scaled ChestXray14 FedMLP two-stage (the
                   bench.py headline) + FedNoRo / FixMatch baselines at
                   the same scale

Each rung reuses bench.py's measurement protocol (settle warm-up, timed
rounds, median statistics; see bench.py docstring) on synthetic data with
the real datasets' geometry — the real CXR/ICH images are not in this
environment. Rung 1 runs batch 8 per the BASELINE table; everything else
uses the reference batch 32 (utils/options.py:20).

Prints one JSON line per rung plus a final `ladder_summary` line, and
appends nothing anywhere — copy the table into RESULTS.md by hand.

Usage: python tools/ladder.py [quick]   # quick: 2 timed rounds per rung
Env: LADDER_RUNGS=1,3,5 selects a subset.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    import bench

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    R = 2 if quick else 3
    sel = os.environ.get("LADDER_RUNGS")
    sel = {int(x) for x in sel.split(",")} if sel else {1, 2, 3, 4, 5}
    only = os.environ.get("LADDER_ONLY")  # substring filter on rung name

    # (rung, runner, kwargs) — N = steps-per-round * K * B
    rungs = []
    if 1 in sel:
        rungs.append((1, "centralized-ich-b0", bench._bench_fedavg, dict(
            ROUNDS=R, MODEL="efficient_b0", B=8, K=1, N=8 * 8 * 8,
            SIZE=224, PROFILE=None, algo="centralized", n_classes=5,
            p_pos=1.0, label="rung1 centralized EffNet-B0 ICH")))
    if 2 in sel:
        rungs.append((2, "fedavg-4client-ich", bench._bench_fedavg, dict(
            ROUNDS=R, MODEL="efficient_b0", B=32, K=4, N=4 * 32 * 8,
            SIZE=224, PROFILE=None, algo="fedavg", n_classes=5,
            p_pos=1.0, label="rung2 FedAvg 4-client IID ICH full labels")))
    if 3 in sel:
        rungs.append((3, "fedmlp-stage1-ich", bench._bench_fedmlp, dict(
            ROUNDS=R, MODEL="efficient_b0", B=32, K=8, N=8 * 32 * 4,
            SIZE=224, PROFILE=None, n_classes=5,
            label="rung3 FedMLP stage-1, 8 ICH clients (ips_stage1)")))
    if 4 in sel:
        rungs.append((4, "fedmlp-twostage-cxr", bench._bench_fedmlp, dict(
            ROUNDS=R, MODEL="efficient_b0", B=32, K=8, N=8 * 32 * 4,
            SIZE=224, PROFILE=None, n_classes=8,
            label="rung4 FedMLP two-stage ChestXray14 8-client")))
    if 5 in sel:
        rungs.append((5, "flagship-20client", bench._bench_fedmlp, dict(
            ROUNDS=R, MODEL="efficient_b0", B=32, K=20, N=20 * 32 * 4,
            SIZE=224, PROFILE=None, n_classes=8,
            label="rung5 flagship: 20-client scaled ChestXray14")))
        for algo in ("fednoro", "fixmatch"):
            rungs.append((5, f"baseline-{algo}-20client", bench._bench_fedavg,
                          dict(ROUNDS=R, MODEL="efficient_b0", B=32, K=20,
                               N=20 * 32 * 4, SIZE=224, PROFILE=None,
                               algo=algo, n_classes=8, p_pos=0.0,
                               label=f"rung5 baseline {algo} 20-client")))

    if only:
        rungs = [r for r in rungs if only in r[1]]

    summary = []
    for rung, name, fn, kw in rungs:
        res = fn(jax, **kw)
        res["rung"] = rung
        res["name"] = name
        print(json.dumps(res), flush=True)
        summary.append({
            "rung": rung, "name": name, "img_per_s": res["value"],
            "stage1": res.get("ips_stage1"), "stage2": res.get("ips_stage2"),
        })

    print(json.dumps({"ladder_summary": summary}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
