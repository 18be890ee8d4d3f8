#!/usr/bin/env python
"""Capture jax.profiler traces of the flagship FedMLP two-stage bench
round (same config as bench.py's fedmlp mode, so the compiled programs hit
.jax_cache): one trace of stage-1 rounds, one of stage-2 rounds.

Usage:
  python tools/profile_flagship.py [--out /tmp/flagship_trace]
Then:
  python tools/analyze_trace.py /tmp/flagship_trace/s1 --steps <rounds*steps>
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/flagship_trace")
    ap.add_argument("--clients", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--model", default="efficient_b0")
    a = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fedmlp_tpu.config import Config, DataConfig, FedMLPConfig
    from fedmlp_tpu.train import Trainer

    K, B = a.clients, a.batch
    N = K * B * 4
    MAXW, R = 6, a.rounds
    stage1_rounds = MAXW + R + 1
    cfg = Config(
        algorithm="fedmlp", model=a.model, batch_size=B, base_lr=3e-5,
        n_clients=K, local_ep=1, rounds_warmup=2 * (MAXW + R),
        eval_every=10_000, seed=1037, p_pos=0.0,
        fedmlp=FedMLPConfig(rounds_stage1=stage1_rounds),
        data=DataConfig(name="synthetic", n_classes=8, image_size=224,
                        synthetic_train_size=N, synthetic_test_size=64),
        compute_dtype="bfloat16",
    )
    t = Trainer(cfg)
    assert t._use_lockstep()

    def sync():
        jax.block_until_ready(t.global_vars["params"])

    rnd = 0

    def run(n):
        nonlocal rnd
        t0 = time.perf_counter()
        for _ in range(n):
            t.run_round(rnd)
            rnd += 1
        sync()
        return time.perf_counter() - t0

    # stage-1 warm-up until settled
    ts = []
    while len(ts) < MAXW:
        ts.append(run(1))
        if len(ts) >= 2 and abs(ts[-1] - ts[-2]) / max(min(ts[-2:]), 1e-9) < 0.4:
            break
    print("stage1 settle:", [round(x, 2) for x in ts], flush=True)
    rnd = stage1_rounds - 1 - R
    with jax.profiler.trace(os.path.join(a.out, "s1")):
        dt1 = run(R)
    print(f"stage1: {dt1:.2f}s for {R} rounds "
          f"({N * R / dt1:.0f} img/s)", flush=True)

    ts = []
    while len(ts) < MAXW:
        ts.append(run(1))
        if len(ts) >= 2 and abs(ts[-1] - ts[-2]) / max(min(ts[-2:]), 1e-9) < 0.4:
            break
    print("stage2 settle:", [round(x, 2) for x in ts], flush=True)
    with jax.profiler.trace(os.path.join(a.out, "s2")):
        dt2 = run(R)
    print(f"stage2: {dt2:.2f}s for {R} rounds "
          f"({N * R / dt2:.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
