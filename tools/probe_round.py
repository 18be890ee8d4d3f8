#!/usr/bin/env python
"""Same-process A/B of engine variants on the full bench round program
(only same-process timings are comparable on the tunneled slice —
BENCH_NOTES.md). Variants via PROBE_VARIANTS env (comma list):

  base        — current defaults (scan_unroll=1, pallas augment)
  unroll4     — lax.scan unroll=4
  unroll8     — fully unrolled local-step loop
  normonly    — augmentation ablated to normalize-only (cost isolation)

Each variant builds its own Trainer; timing = pipelined rounds with one
final sync, exactly like bench.py phase B.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VARIANTS = {
    "base": {},
    "unroll2": {"scan_unroll": 2},
    "unroll4": {"scan_unroll": 4},
    "unroll8": {"scan_unroll": 8},
    "normonly": {"augment_backend": "normonly"},
    "unroll4_normonly": {"scan_unroll": 4, "augment_backend": "normonly"},
    "mapped": {"client_stacking": "off"},
    "nostream": {"client_stacking": "off", "weight_stream": 0},
    "fusedaug": {"client_stacking": "off", "augment_backend": "fused"},
    "nohoist": {"client_stacking": "off", "hoist_augment": 0},
    "stacked": {"client_stacking": "on"},
    "stacked_unroll4": {"client_stacking": "on", "scan_unroll": 4},
    "base2": {},  # repeat-of-base slot for drift-bracketed A/B/A runs
    "dw_pallas": {"dw_backend": "pallas"},
    "dw_taps": {"dw_backend": "taps"},
    "remat": {"remat": 1},
}


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fedmlp_tpu.config import Config, DataConfig
    from fedmlp_tpu.train import Trainer

    K = int(os.environ.get("BENCH_CLIENTS", "4"))
    B = int(os.environ.get("BENCH_BATCH", "32"))
    N = K * B * 8
    ROUNDS = int(os.environ.get("BENCH_ROUNDS", "5"))
    names = os.environ.get("PROBE_VARIANTS", "base,unroll4,normonly").split(",")

    results = {"platform": jax.devices()[0].platform}
    for name in names:
        opts = dict(VARIANTS[name])
        aug = opts.pop("augment_backend", "auto")
        cfg = Config(
            algorithm="fedavg", model="efficient_b0", batch_size=B,
            base_lr=3e-5, n_clients=K, local_ep=1,
            rounds_warmup=2 * ROUNDS + 2, eval_every=10_000, seed=1037,
            p_pos=1.0,
            data=DataConfig(name="synthetic", n_classes=5, image_size=224,
                            synthetic_train_size=N, synthetic_test_size=64,
                            augment_backend=aug),
            compute_dtype="bfloat16", **opts,
        )
        t = Trainer(cfg)
        t.run_round(0)
        t.run_round(1)
        np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(t.global_vars["params"])[0].ravel()[:1]))
        imgs_per_round = int(np.asarray(t.fd.valid).sum())

        import contextlib

        prof_dir = os.environ.get("PROBE_PROFILE")
        prof = (jax.profiler.trace(f"{prof_dir}/{name}")
                if prof_dir else contextlib.nullcontext())
        rnd = 2
        t0 = time.perf_counter()
        with prof:
            for _ in range(ROUNDS):
                state, _losses, _ = t.local_pass(
                    t.round_fn, {"labels": t.fd.obs_targets},
                    t.round_scalars(rnd)
                )
                t.global_vars = t.aggregate(state["vars"], t.dict_len)
                rnd += 1
            np.asarray(jax.device_get(
                jax.tree_util.tree_leaves(
                    t.global_vars["params"])[0].ravel()[:1]))
        per_round = (time.perf_counter() - t0) / ROUNDS
        results[f"{name}_round_ms"] = round(per_round * 1e3, 1)
        results[f"{name}_imgps"] = round(imgs_per_round / per_round, 1)
        print(json.dumps({name: results[f"{name}_imgps"]}), flush=True)
        del t

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
