#!/usr/bin/env python
"""Throughput benchmark: preprocessed+trained images/sec/chip.

Flagship config (BASELINE.json): EfficientNet-B0, multi-label BCE, federated
local steps with on-device augmentation. The metric counts raw training
images consumed per wall-clock second on one chip — augmentation + forward +
backward + optimizer, end to end, vs the 5k img/s/chip target.

Prints exactly one JSON line:
  {"metric": "train_images_per_sec_per_chip", "value": N, "unit": "img/s",
   "vs_baseline": N/5000}
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    # persistent compilation cache: the big round program compiles once per
    # image, not once per bench invocation
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fedmlp_tpu.config import Config, DataConfig
    from fedmlp_tpu.train import Trainer

    n_chips = jax.device_count()
    # keep the benchmark single-chip-normalized: clients ride one chip here
    K = int(os.environ.get("BENCH_CLIENTS", "4"))
    B = int(os.environ.get("BENCH_BATCH", "32"))
    N = int(os.environ.get("BENCH_TRAIN_N", str(K * B * 8)))
    SIZE = int(os.environ.get("BENCH_IMAGE", "224"))
    MODEL = os.environ.get("BENCH_MODEL", "efficient_b0")
    ROUNDS = int(os.environ.get("BENCH_ROUNDS", "3"))

    cfg = Config(
        algorithm="fedavg",
        model=MODEL,
        batch_size=B,
        base_lr=3e-5,
        n_clients=K,
        local_ep=1,
        rounds_warmup=ROUNDS + 2,
        eval_every=10_000,
        seed=1037,
        p_pos=1.0,
        data=DataConfig(
            name="synthetic",
            n_classes=5,
            image_size=SIZE,
            synthetic_train_size=N,
            synthetic_test_size=64,
        ),
        compute_dtype="bfloat16",
    )
    t = Trainer(cfg)

    # warm-up: compile + shake out backend slow-start
    t.run_round(0)
    t.run_round(1)
    jax.block_until_ready(t.global_vars["params"])

    imgs_per_round = int(np.asarray(t.fd.valid).sum()) * cfg.local_ep
    # per-round timing; report the median (the tunneled chip's throughput
    # fluctuates between sessions — median filters transient slowdowns)
    times = []
    for r in range(2, 2 + ROUNDS):
        t0 = time.perf_counter()
        t.run_round(r)
        jax.block_until_ready(t.global_vars["params"])
        times.append(time.perf_counter() - t0)

    ips = imgs_per_round / float(np.median(times)) / max(1, n_chips)
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_per_chip",
                "value": round(ips, 2),
                "unit": "img/s",
                "vs_baseline": round(ips / 5000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
