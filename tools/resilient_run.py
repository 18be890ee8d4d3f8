#!/usr/bin/env python
"""Crash-resilient runner: retry a training/measurement command when the
TPU worker dies underneath it.

Why this exists: the weak+strong (FixMatch/CBAFed-style) program at
scale (K=20, B=32, 224px) sporadically kills the TPU worker process
(UNAVAILABLE, "kernel fault") — a flaky libtpu-level fault under the
tunneled backend that follows the strong RandAugment program, not any
particular weak-augment backend, and that we cannot patch (BENCH_NOTES
"Round-4: BASELINE ladder"). The same tunnel also occasionally wedges
whole fresh processes. The reference never sees either because it is
torch-on-CPU/GPU (reference main.py:106-357 has no failure handling at
all); a production TPU deployment needs the failure-detection /
recovery layer instead (SURVEY.md §5 aux subsystems).

This supervisor:
  1. runs the given command, teeing its output through;
  2. on a nonzero exit whose stderr tail matches a known TPU-worker
     crash signature, waits ``--backoff`` seconds (the tunnel recovers
     on its own) and reruns, up to ``--max_restarts`` times;
  3. with ``--ckpt_glob``, resumes each retry from the newest matching
     checkpoint by appending ``--resume <file>`` (the CLI's bitwise
     checkpoint-resume path, tests/test_cli_checkpoint.py), so a long
     run loses at most ``checkpoint_every`` rounds per crash;
  4. prints one final JSON line with restart counts and signatures.

Usage:
  # stateless measurement (e.g. a ladder rung): plain retry
  python tools/resilient_run.py -- python tools/ladder.py --rung 5

  # long training run: retry + checkpoint resume
  python tools/resilient_run.py \
      --ckpt_glob 'outputs/myexp/**/models/ckpt_*.pkl' -- \
      python -m fedmlp_tpu.cli --exp FedMLP --dataset synthetic ...

Exit status: the wrapped command's final exit status (0 on eventual
success), or 3 if restarts were exhausted.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import time

# Stderr signatures that mean "the device/worker died, not the program".
# Anything else (assertion, OOM in our code, bad flag) fails fast.
CRASH_SIGNATURES = (
    r"UNAVAILABLE: TPU worker process crashed",
    r"TPU worker process crashed or restarted",
    r"kernel fault",
    r"UNAVAILABLE: Connection reset",
    r"DEADLINE_EXCEEDED.*(tpu|axon|transfer)",
    r"FAILED_PRECONDITION: .*device.*halt",
)


def classify(stderr_tail: str) -> str | None:
    for sig in CRASH_SIGNATURES:
        if re.search(sig, stderr_tail, re.IGNORECASE):
            return sig
    return None


def newest(pattern: str) -> str | None:
    """Newest checkpoint by round number (ckpt_<rnd>.pkl), falling back
    to mtime for non-standard names."""
    hits = glob.glob(pattern, recursive=True)
    if not hits:
        return None

    def key(p: str):
        m = re.search(r"ckpt_(\d+)\.pkl$", p)
        return (1, int(m.group(1))) if m else (0, os.path.getmtime(p))

    return max(hits, key=key)


def run_once(cmd: list[str], tail_lines: int = 200) -> tuple[int, str]:
    """Run cmd, streaming output through, keeping a stderr/stdout tail
    for crash classification."""
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    tail: list[str] = []
    assert proc.stdout is not None
    for line in proc.stdout:
        sys.stdout.write(line)
        sys.stdout.flush()
        tail.append(line)
        if len(tail) > tail_lines:
            tail.pop(0)
    proc.wait()
    return proc.returncode, "".join(tail)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_restarts", type=int, default=3)
    ap.add_argument("--backoff", type=float, default=60.0,
                    help="seconds to wait before a retry (the tunnel "
                    "recovers on its own; CLAUDE.md tunnel-wedge note)")
    ap.add_argument("--ckpt_glob", default="",
                    help="recursive glob for checkpoints; when set, each "
                    "retry appends --resume <newest match>")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- followed by the command to run")
    a = ap.parse_args()
    cmd = a.cmd[1:] if a.cmd and a.cmd[0] == "--" else a.cmd
    if not cmd:
        ap.error("no command given (use: resilient_run.py [opts] -- cmd ...)")

    t0 = time.time()
    crashes: list[dict] = []
    attempt = 0
    while True:
        run_cmd = list(cmd)
        if a.ckpt_glob and attempt > 0:
            ck = newest(a.ckpt_glob)
            if ck:
                # replace any --resume the caller (or a prior retry) set
                if "--resume" in run_cmd:
                    i = run_cmd.index("--resume")
                    del run_cmd[i:i + 2]
                run_cmd += ["--resume", ck]
        rc, tail = run_once(run_cmd)
        if rc == 0:
            break
        sig = classify(tail)
        if sig is None:
            print(json.dumps({"resilient_run": "program_error", "rc": rc,
                              "attempt": attempt}), flush=True)
            return rc
        crashes.append({"attempt": attempt, "signature": sig, "rc": rc})
        if attempt >= a.max_restarts:
            print(json.dumps({"resilient_run": "exhausted", "rc": rc,
                              "restarts": attempt, "crashes": crashes,
                              "wall_s": round(time.time() - t0, 1)}),
                  flush=True)
            return 3
        attempt += 1
        print(f"# resilient_run: TPU-worker crash (sig={sig!r}); "
              f"retry {attempt}/{a.max_restarts} after {a.backoff:.0f}s",
              flush=True)
        time.sleep(a.backoff)

    print(json.dumps({"resilient_run": "ok", "restarts": attempt,
                      "crashes": crashes,
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
