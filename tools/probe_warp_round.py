#!/usr/bin/env python
"""Same-process interleaved A/B: augment backend 'pallas' (v1 3-kernel
Paeth pipeline) vs 'fused' (v3 single-kernel block-parallel warp) on the
flagship FedMLP stage-1 lockstep round. Timed phases alternate rep by rep
so slice weather cancels (CLAUDE.md benchmarking rule).

Env: PW_CLIENTS (20), PW_BATCH (32), PW_STEPS (4), PW_IMAGE (224),
PW_MODEL (efficient_b0), PW_REPS (4), PW_ROUNDS_PER_REP (2).
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

    K = int(os.environ.get("PW_CLIENTS", "20"))
    B = int(os.environ.get("PW_BATCH", "32"))
    S = int(os.environ.get("PW_STEPS", "4"))
    SIZE = int(os.environ.get("PW_IMAGE", "224"))
    MODEL = os.environ.get("PW_MODEL", "efficient_b0")
    REPS = int(os.environ.get("PW_REPS", "4"))
    RPP = int(os.environ.get("PW_ROUNDS_PER_REP", "2"))

    def make(backend):
        cfg = Config(
            algorithm="fedmlp",
            model=MODEL,
            batch_size=B,
            base_lr=3e-5,
            n_clients=K,
            local_ep=1,
            rounds_warmup=1000,
            eval_every=10_000,
            seed=1037,
            p_pos=0.0,
            fedmlp=FedMLPConfig(rounds_stage1=10_000),  # stage-1 only
            data=DataConfig(name="synthetic", n_classes=8, image_size=SIZE,
                            synthetic_train_size=K * B * S,
                            synthetic_test_size=64,
                            augment_backend=backend),
            compute_dtype="bfloat16",
            batched_global="on",
            output_dir="",
        )
        return Trainer(cfg)

    trainers = {"pallas_v1": make("pallas"), "fused_v3": make("fused")}
    imgs_per_round = K * B * S

    rnds = {name: 0 for name in trainers}
    for name, t in trainers.items():
        t0 = time.perf_counter()
        t.run_round(rnds[name]); rnds[name] += 1
        jax.block_until_ready(t.global_vars["params"])
        print(f"warmup {name}: {time.perf_counter()-t0:.1f}s", flush=True)
        # settle: first executions absorb upload/cache writes
        t0 = time.perf_counter()
        t.run_round(rnds[name]); rnds[name] += 1
        jax.block_until_ready(t.global_vars["params"])
        print(f"settle {name}: {time.perf_counter()-t0:.2f}s", flush=True)

    times = {name: [] for name in trainers}
    for rep in range(REPS):
        for name, t in trainers.items():
            t0 = time.perf_counter()
            for _ in range(RPP):
                t.run_round(rnds[name]); rnds[name] += 1
            jax.block_until_ready(t.global_vars["params"])
            dt = (time.perf_counter() - t0) / RPP
            times[name].append(dt)
            print(f"rep {rep} {name}: {dt*1e3:.1f} ms/round "
                  f"({imgs_per_round/dt:.0f} img/s)", flush=True)

    out = {}
    for name, ts in times.items():
        med = float(np.median(ts))
        out[name] = {"ms_per_round": round(med * 1e3, 1),
                     "img_per_s": round(imgs_per_round / med, 1),
                     "all_ms": [round(x * 1e3, 1) for x in ts]}
    out["speedup_fused"] = round(
        out["pallas_v1"]["ms_per_round"] / out["fused_v3"]["ms_per_round"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
