#!/usr/bin/env python
"""Tabulate the head-to-head trajectories + multi-seed spread verdicts.

Per-round table (as before) plus, for every experiment with multi-seed
runs on both sides, a final-round spread table: per-side mean ± half-range
over seeds for each metric, and whether the cross-framework mean gap sits
inside the measured seed spread (the data-order noise floor)."""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..")))
from tools.ref_parity import common as C

EXPS = ("FedAVG", "FedMLP", "FedNoRo", "CBAFed", "FedAVG+FixMatch")
METRICS = ("mAP", "auc", "BACC", "F1")


def load(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def seed_files(side, exp):
    """{seed_offset: records} for side ('reference'|'ours') and exp."""
    out = {}
    base = os.path.join(C.OUT, f"{side}_{exp}.jsonl")
    if os.path.exists(base):
        out[0] = load(base)
    for p in glob.glob(os.path.join(C.OUT, f"{side}_{exp}_s*.jsonl")):
        m = re.search(r"_s(\d+)\.jsonl$", p)
        if m:
            out[int(m.group(1))] = load(p)
    return out


def final_metrics(records):
    for r in reversed(records):
        if "metrics" in r:
            return r["metrics"]
    return None


def main():
    print(f"{'exp':16} {'rnd':>3} {'side':5} {'loss':>8} {'mAP':>7} "
          f"{'auc':>7} {'BACC':>7} {'F1':>7}")
    for exp in EXPS:
        recs = {}
        for side in ("reference", "ours"):
            files = seed_files(side, exp)
            if 0 in files:
                recs["ref" if side == "reference" else "ours"] = files[0]
        if not recs:
            continue
        n = max(len(v) for v in recs.values())
        for rnd in range(n):
            for side, rs in recs.items():
                if rnd >= len(rs):
                    continue
                r = rs[rnd]
                m = r.get("metrics")
                loss = sum(r["losses"]) / len(r["losses"])
                if m:
                    print(f"{exp:16} {rnd:>3} {side:5} {loss:8.4f} "
                          f"{m['mAP']:7.4f} {m['auc']:7.4f} "
                          f"{m['BACC']:7.4f} {m['F1']:7.4f}")
        print()

    # ---- multi-seed spread verdicts ----
    for exp in EXPS:
        ref = seed_files("reference", exp)
        ours = seed_files("ours", exp)
        if len(ref) < 2 or len(ours) < 2:
            continue
        print(f"== {exp}: final-round spread over seeds "
              f"(ref n={len(ref)}, ours n={len(ours)}) ==")
        print(f"{'metric':7} {'ref mean±hr':>16} {'ours mean±hr':>16} "
              f"{'|gap|':>7} {'within spread?':>15}")
        for met in METRICS:
            rv = [final_metrics(r)[met] for r in ref.values()
                  if final_metrics(r)]
            ov = [final_metrics(r)[met] for r in ours.values()
                  if final_metrics(r)]
            rm, om = sum(rv) / len(rv), sum(ov) / len(ov)
            rh = (max(rv) - min(rv)) / 2
            oh = (max(ov) - min(ov)) / 2
            gap = abs(rm - om)
            ok = gap <= max(rh, oh) * 1.5 + 1e-9
            print(f"{met:7} {rm:9.4f}±{rh:.4f} {om:9.4f}±{oh:.4f} "
                  f"{gap:7.4f} {'YES' if ok else 'NO':>15}")
        print()


if __name__ == "__main__":
    main()
