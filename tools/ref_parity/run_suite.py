#!/usr/bin/env python
"""Run the full head-to-head parity suite sequentially (see README.md).

One subprocess per run (fresh torch/jax state, bounded RSS on the 1-core
host), resumable: a run whose output JSONL already exists is skipped.
Suite = 5 experiments x both sides, plus 3 seeds per side for
FedAVG/FedMLP so `compare.py` can print the data-order noise floor the
cross-framework gap is judged against (VERDICT r4 item 6).

Usage: python tools/ref_parity/run_suite.py [--only ref|ours]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..")))
from tools.ref_parity import common as C

HERE = os.path.dirname(os.path.abspath(__file__))

MULTI_SEED = {"FedAVG": (0, 1, 2), "FedMLP": (0, 1, 2)}
SINGLE_SEED = ("FedNoRo", "CBAFed", "FedAVG+FixMatch")


def runs():
    for exp, seeds in MULTI_SEED.items():
        for s in seeds:
            yield exp, s
    for exp in SINGLE_SEED:
        yield exp, 0


def out_path(side, exp, seed):
    suffix = f"_s{seed}" if seed else ""
    return os.path.join(C.OUT, f"{side}_{exp}{suffix}.jsonl")


def main():
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
        assert only in ("ref", "ours")
    sides = {"ref": ("reference", "run_reference.py"),
             "ours": ("ours", "run_ours.py")}
    if only:
        sides = {only: sides[only]}
    for key, (side, script) in sides.items():
        for exp, seed in runs():
            p = out_path(side, exp, seed)
            if os.path.exists(p):
                print(f"[skip] {side} {exp} s{seed} (exists)", flush=True)
                continue
            cmd = [sys.executable, os.path.join(HERE, script), exp]
            if seed:
                cmd += ["--seed", str(seed)]
            t0 = time.time()
            print(f"[run ] {side} {exp} s{seed} ...", flush=True)
            r = subprocess.run(cmd, stdout=subprocess.PIPE,
                               stderr=subprocess.STDOUT, text=True)
            dt = time.time() - t0
            if r.returncode != 0:
                print(r.stdout[-4000:], flush=True)
                print(f"[FAIL] {side} {exp} s{seed} rc={r.returncode} "
                      f"({dt:.0f}s)", flush=True)
                sys.exit(1)
            print(f"[ ok ] {side} {exp} s{seed} ({dt:.0f}s)", flush=True)
    print("suite complete", flush=True)


if __name__ == "__main__":
    main()
