#!/usr/bin/env python
"""Protocol-shaped accuracy rehearsal on the real chip: FedMLP vs FedAVG
under the reference's task-heterogeneity setting (one annotated class per
client, all other positives hidden — reference main.py:63,76), following
the reference evaluation protocol shape (reference main.py:322-357,
utils/options.py:44-46):

  * warm init — the reference trains from ImageNet weights
    (utils/options.py:24-25); real ImageNet weights are unavailable in
    this environment, so the rehearsal pre-trains the backbone centrally
    on a DISJOINT fully-labeled synthetic split (same domain, different
    samples) and both algorithms start from those weights;
  * 100+ federated rounds with stage1 ≈ 50% of the budget (the reference
    runs 500 rounds with rounds_FedMLP_stage1=50);
  * evaluation every 10 rounds (reference cadence) with the full 7-metric
    suite plus the per-class AUC table of classtest
    (reference utils/evaluations.py:89-133).

Emits one JSON line per (algorithm, eval round), a per-class AUC table,
and a final summary for RESULTS.md.

Env: DR_ROUNDS (120), DR_STAGE1 (60), DR_TRAIN_N (10000), DR_TEST_N
(2000), DR_PRETRAIN_N (4000), DR_PRETRAIN_EPOCHS (8), DR_MODEL
(efficient_b0), DR_CLASSES (8 = ChestXray14 geometry), DR_EVAL_EVERY
(10), DR_ALGOS (fedavg,fedmlp).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fedmlp_tpu.config import Config, DataConfig, FedMLPConfig
    from fedmlp_tpu.data.datasets import make_synthetic_dataset
    from fedmlp_tpu.eval.metrics import roc_auc
    from fedmlp_tpu.train import Trainer

    ROUNDS = int(os.environ.get("DR_ROUNDS", "120"))
    STAGE1 = int(os.environ.get("DR_STAGE1", "60"))
    N = int(os.environ.get("DR_TRAIN_N", "10000"))
    NT = int(os.environ.get("DR_TEST_N", "2000"))
    NP = int(os.environ.get("DR_PRETRAIN_N", "4000"))
    EPOCHS = int(os.environ.get("DR_PRETRAIN_EPOCHS", "8"))
    MODEL = os.environ.get("DR_MODEL", "efficient_b0")
    C = int(os.environ.get("DR_CLASSES", "8"))
    EVERY = int(os.environ.get("DR_EVAL_EVERY", "10"))
    ALGOS = os.environ.get("DR_ALGOS", "fedavg,fedmlp").split(",")

    train_ds = make_synthetic_dataset(N, C, 224, seed=1037)
    test_ds = make_synthetic_dataset(NT, C, 224, seed=2037)

    # ---- phase 0: central warm-up on a disjoint fully-labeled split ----
    pretrain_vars = None
    if EPOCHS > 0:
        pre_ds = make_synthetic_dataset(NP, C, 224, seed=3037)
        cfg0 = Config(
            algorithm="centralized", model=MODEL, batch_size=32,
            base_lr=3e-4, n_clients=1, local_ep=1, rounds_warmup=EPOCHS,
            eval_every=max(EPOCHS, 1), seed=1037, p_pos=1.0,
            data=DataConfig(name="synthetic", n_classes=C, image_size=224),
            compute_dtype="bfloat16", output_dir="",
        )
        t0 = time.perf_counter()
        tr0 = Trainer(cfg0, train_ds=pre_ds, test_ds=test_ds)
        for e in range(EPOCHS):
            tr0.run_round(e)
        pretrain_vars = jax.tree_util.tree_map(
            lambda x: np.asarray(x), tr0.global_vars)
        m0 = tr0.evaluate()
        print(json.dumps({
            "event": "pretrain", "epochs": EPOCHS, "n": NP,
            "seconds": round(time.perf_counter() - t0, 1),
            "auc": round(float(m0["auc"]), 4),
            "mAP": round(float(m0["mAP"]), 4)}), flush=True)
        del tr0

    summary = {}
    for algo in ALGOS:
        cfg = Config(
            algorithm=algo,
            model=MODEL,
            batch_size=32,
            base_lr=3e-5,  # reference ICH default (utils/options.py:21)
            n_clients=C,  # one client per class (reference main.py:76)
            annotation_num=1,
            local_ep=1,
            rounds_warmup=ROUNDS,
            eval_every=EVERY,
            seed=1037,
            p_pos=0.0,  # hide ALL positives of non-active classes
            data=DataConfig(name="synthetic", n_classes=C, image_size=224,
                            synthetic_train_size=N, synthetic_test_size=NT),
            fedmlp=FedMLPConfig(rounds_stage1=STAGE1),
            compute_dtype="bfloat16",
            output_dir="",
        )
        t = Trainer(cfg, train_ds=train_ds, test_ds=test_ds)
        if pretrain_vars is not None:
            t.global_vars = jax.tree_util.tree_map(
                jax.numpy.asarray, pretrain_vars)
        history = []
        t0 = time.perf_counter()
        for rnd in range(ROUNDS):
            rec = t.run_round(rnd)
            if rec.metrics:
                row = {"algo": algo, "round": rnd,
                       "minutes": round((time.perf_counter() - t0) / 60, 1),
                       **{k: round(float(v), 4)
                          for k, v in rec.metrics.items()
                          if k in ("mAP", "auc", "BACC", "F1")}}
                history.append(row)
                print(json.dumps(row), flush=True)
        # per-class AUC table (classtest parity,
        # reference utils/evaluations.py:89-133)
        probs = t.eval_probs(t.global_vars, t.test_ds.images)
        per_class = [round(float(roc_auc(t.test_ds.targets[:, c], probs[:, c])), 4)
                     for c in range(C)]
        print(json.dumps({"algo": algo, "per_class_auc": per_class}),
              flush=True)
        summary[algo] = {"history": history, "per_class_auc": per_class}
        del t

    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
