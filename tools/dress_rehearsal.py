#!/usr/bin/env python
"""Accuracy dress rehearsal on the real chip: FedMLP vs FedAVG under the
reference's task-heterogeneity setting (one annotated class per client,
all other positives hidden — reference main.py:63,76) with the FLAGSHIP
backbone (EfficientNet-B0, 224 px, bf16, Pallas augmentation).

Emits one JSON line per (algorithm, eval round) plus a final summary, for
RESULTS.md. Runs in ~10 min on the tunneled slice.

Env: DR_ROUNDS (default 30), DR_STAGE1 (10), DR_TRAIN_N (2000),
DR_TEST_N (400), DR_MODEL (efficient_b0), DR_CLASSES/CLIENTS (5).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fedmlp_tpu.config import Config, DataConfig, FedMLPConfig
    from fedmlp_tpu.train import Trainer

    ROUNDS = int(os.environ.get("DR_ROUNDS", "30"))
    STAGE1 = int(os.environ.get("DR_STAGE1", "10"))
    N = int(os.environ.get("DR_TRAIN_N", "2000"))
    NT = int(os.environ.get("DR_TEST_N", "400"))
    MODEL = os.environ.get("DR_MODEL", "efficient_b0")
    C = int(os.environ.get("DR_CLASSES", "5"))

    summary = {}
    for algo in ("fedavg", "fedmlp"):
        cfg = Config(
            algorithm=algo,
            model=MODEL,
            batch_size=32,
            base_lr=3e-5,  # reference ICH default (utils/options.py:21)
            n_clients=C,
            annotation_num=1,
            local_ep=1,
            rounds_warmup=ROUNDS,
            eval_every=5,
            seed=1037,
            p_pos=0.0,  # hide ALL positives of non-active classes
            data=DataConfig(name="synthetic", n_classes=C, image_size=224,
                            synthetic_train_size=N, synthetic_test_size=NT),
            fedmlp=FedMLPConfig(rounds_stage1=STAGE1),
            compute_dtype="bfloat16",
            output_dir="",
        )
        t = Trainer(cfg)
        history = []
        for rnd in range(ROUNDS):
            rec = t.run_round(rnd)
            if rec.metrics:
                row = {"algo": algo, "round": rnd,
                       **{k: round(float(v), 4)
                          for k, v in rec.metrics.items()
                          if k in ("mAP", "auc", "BACC", "F1")}}
                history.append(row)
                print(json.dumps(row), flush=True)
        summary[algo] = history
        del t

    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
