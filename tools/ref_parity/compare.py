#!/usr/bin/env python
"""Tabulate the head-to-head trajectories (see README.md)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..")))
from tools.ref_parity import common as C


def load(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def main():
    print(f"{'exp':7} {'rnd':>3} {'side':5} {'loss':>8} {'mAP':>7} "
          f"{'auc':>7} {'BACC':>7} {'F1':>7}")
    for exp in ("FedAVG", "FedMLP"):
        recs = {}
        for side, fn in (("ref", f"reference_{exp}.jsonl"),
                         ("ours", f"ours_{exp}.jsonl")):
            p = os.path.join(C.OUT, fn)
            if os.path.exists(p):
                recs[side] = load(p)
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
                    print(f"{exp:7} {rnd:>3} {side:5} {loss:8.4f} "
                          f"{m['mAP']:7.4f} {m['auc']:7.4f} "
                          f"{m['BACC']:7.4f} {m['F1']:7.4f}")
        print()


if __name__ == "__main__":
    main()
