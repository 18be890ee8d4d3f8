#!/usr/bin/env python
"""Same-process A/B of per-block remat on FLAGSHIP-shaped FedMLP stage-1
rounds (K=20, B=32, efficient_b0, 224px — the config BASELINE names).

remat=1 saves only MBConv block inputs as grad residuals and recomputes
the 6x-expanded internals in the backward (models/efficientnet.py). The
step is HBM-bandwidth-bound (BENCH_NOTES.md: 286 GB/step measured vs
~115 GB ideal), so trading idle FLOPs for residual bytes is the
hypothesis under test.

Timing alternates A/B/A/B per round pass to cancel slice-weather drift
(only same-process interleaved timings are comparable on the tunneled
chip).
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
    from fedmlp_tpu.train import Trainer

    K = int(os.environ.get("BENCH_CLIENTS", "20"))
    B = int(os.environ.get("BENCH_BATCH", "32"))
    N = K * B * 4
    REPS = int(os.environ.get("BENCH_ROUNDS", "5"))

    def mk(remat):
        cfg = Config(
            algorithm="fedmlp", model="efficient_b0", batch_size=B,
            base_lr=3e-5, n_clients=K, local_ep=1,
            rounds_warmup=4 * REPS + 4, eval_every=10_000, seed=1037,
            p_pos=0.0, remat=remat,
            fedmlp=FedMLPConfig(rounds_stage1=10_000),  # stage 1 forever
            data=DataConfig(name="synthetic", n_classes=8, image_size=224,
                            synthetic_train_size=N, synthetic_test_size=64),
            compute_dtype="bfloat16",
        )
        return Trainer(cfg)

    trainers = {"base": mk(0), "remat": mk(1)}
    imgs = None
    for name, t in trainers.items():
        t.run_round(0)  # compile
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(
            t.global_vars["params"])[0].ravel()[:1]))
        imgs = int(np.asarray(t.fd.valid).sum())

    times = {k: [] for k in trainers}
    rnd = 1
    for _ in range(REPS):
        for name, t in trainers.items():
            t0 = time.perf_counter()
            state, _losses, _ = t.local_pass(
                t.round_fn, {"labels": t.fd.obs_targets},
                t.round_scalars(rnd))
            t.global_vars = t.aggregate(state["vars"], t.dict_len)
            np.asarray(jax.device_get(jax.tree_util.tree_leaves(
                t.global_vars["params"])[0].ravel()[:1]))
            times[name].append(time.perf_counter() - t0)
        rnd += 1

    out = {"platform": jax.devices()[0].platform, "K": K, "B": B,
           "imgs_per_round": imgs}
    for name, ts in times.items():
        med = float(np.median(ts))
        out[f"{name}_round_ms"] = round(med * 1e3, 1)
        out[f"{name}_imgps"] = round(imgs / med, 1)
    out["speedup"] = round(out["base_round_ms"] / out["remat_round_ms"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
