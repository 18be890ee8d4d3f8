#!/usr/bin/env python
"""Same-process interleaved A/B of engine variants on FLAGSHIP-shaped
FedMLP stage-1 rounds (K=20, B=32, efficient_b0, 224px). Extends
probe_viewcat.py to an arbitrary variant list — timing alternates
variant-by-variant per rep to cancel slice-weather drift.

PROBE_VARIANTS (comma list):
  base         — current defaults (warp v4 taps)
  taps_legacy  — warp v3 fixed 6-tap set (round-4 A/B: tap count)
  viewcat      — dual views as one 2B student forward
  cunroll      — lockstep client map unrolled to static slices
  cunroll_viewcat — both

Env: BENCH_CLIENTS/BENCH_BATCH/BENCH_ROUNDS as usual.
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
    "base2": {},  # drift bracket for A/B/A runs
    "taps_legacy": {"_legacy_taps": True},
    "viewcat": {"view_concat": "on"},
    "cunroll": {"client_unroll": 1},
    "cunroll_viewcat": {"client_unroll": 1, "view_concat": "on"},
    "dwdense": {"dw_backend": "dense"},
    "dwdense_viewcat": {"dw_backend": "dense", "view_concat": "on"},
    "dwreroute": {"dw_backend": "reroute", "view_concat": "on"},
    "vmem64": {"view_concat": "on", "_env": {
        "FEDMLP_COMPILER_OPTIONS": "xla_tpu_scoped_vmem_limit_kib=65536"}},
    # selective remat of the byte-fat early stages (round-4 HLO study):
    # recompute the 112/56 px block internals in the backward instead of
    # round-tripping their lane-padded activations through HBM
    "remat01": {"remat_stages": "0,1"},
    "remat012": {"remat_stages": "0,1,2"},
    "rematall": {"remat": 1},
    # round-2 closed-negative knob, re-measured once at the round-4
    # operating point (VERDICT r3 item 7)
    "wstream": {"weight_stream": 1},
    # round-4 tail: hoisted 2B concat (per-client in-map concat lowered to
    # a 38.5 MB layout-conversion copy each, stage-1 trace r4b)
    "precat_off": {"view_precat": "off"},
    # warp v5: wider shear blocks — fewer serialized dynamic rolls per
    # pass (the kernel is VMEM-latency-bound, round-4 profile) at the cost
    # of a wider bit-identical tap set
    "rb16": {"_rb": 16},
    "rb32": {"_rb": 32},
    # round-4 tail: pack the lockstep map's ~250 tiny f32 output leaves
    # (BN scale/bias grads + running stats) into one flat vector — attacks
    # the ~15.6 ms/step of tiny per-client copy-done DMA latency
    "smallpack": {"small_pack": 4096},
    "smallpack16k": {"small_pack": 16384},
    # round-5 compiler-option sweep (VERDICT item 2): the conv fusions
    # average 426 GB/s while the chip sustains 750-800 — scheduler/VMEM
    # flags are the remaining non-shape levers
    "lhs": {"_env": {"FEDMLP_COMPILER_OPTIONS":
                     "xla_tpu_enable_latency_hiding_scheduler=true"}},
    "vmem32": {"_env": {"FEDMLP_COMPILER_OPTIONS":
                        "xla_tpu_scoped_vmem_limit_kib=32768"}},
    "vmem96": {"_env": {"FEDMLP_COMPILER_OPTIONS":
                        "xla_tpu_scoped_vmem_limit_kib=98304"}},
    "vmem128": {"_env": {"FEDMLP_COMPILER_OPTIONS":
                         "xla_tpu_scoped_vmem_limit_kib=131072"}},
    # (xla_tpu_memory_limit_slop_factor: REJECTED by this slice's remote
    # compiler — HTTP 500 at compile; not a usable knob here)
    "lhs_vmem96": {"_env": {"FEDMLP_COMPILER_OPTIONS":
                            "xla_tpu_enable_latency_hiding_scheduler=true,"
                            "xla_tpu_scoped_vmem_limit_kib=98304"}},
    # augmentation ablation: bounds the warp's CRITICAL-PATH share (trace
    # time != wall time — see the small_pack lesson); normonly now also
    # ablates the strong pipeline for weak_strong programs
    "normonly": {"_backend": "normonly"},
}


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fedmlp_tpu.config import Config, DataConfig, FedMLPConfig
    from fedmlp_tpu.train import Trainer
    from fedmlp_tpu.ops import pallas_warp

    K = int(os.environ.get("BENCH_CLIENTS", "20"))
    B = int(os.environ.get("BENCH_BATCH", "32"))
    N = K * B * 4
    REPS = int(os.environ.get("BENCH_ROUNDS", "5"))
    names = os.environ.get("PROBE_VARIANTS", "base,taps_legacy").split(",")

    def mk(opts):
        opts = dict(opts)
        legacy = opts.pop("_legacy_taps", False)
        backend = opts.pop("_backend", "auto")
        rb = opts.pop("_rb", None)
        env = opts.pop("_env", {})
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        cfg = Config(
            algorithm="fedmlp", model="efficient_b0", batch_size=B,
            base_lr=3e-5, n_clients=K, local_ep=1,
            rounds_warmup=4 * REPS + 4, eval_every=10_000, seed=1037,
            p_pos=0.0,
            fedmlp=FedMLPConfig(rounds_stage1=10_000),  # stage 1 forever
            data=DataConfig(name="synthetic", n_classes=8, image_size=224,
                            synthetic_train_size=N, synthetic_test_size=64,
                            augment_backend=backend),
            compute_dtype="bfloat16", **opts,
        )
        pallas_warp._FORCE_LEGACY_TAPS = legacy
        pallas_warp._RB_OVERRIDE = rb
        t = Trainer(cfg)
        t.run_round(0)  # compile under the current taps/rb flags
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(
            t.global_vars["params"])[0].ravel()[:1]))
        pallas_warp._FORCE_LEGACY_TAPS = False
        pallas_warp._RB_OVERRIDE = None
        for k_, v_ in saved.items():
            if v_ is None:
                os.environ.pop(k_, None)
            else:
                os.environ[k_] = v_
        return t

    trainers = {}
    imgs = None
    for name in names:
        t0 = time.perf_counter()
        trainers[name] = mk(VARIANTS[name])
        imgs = int(np.asarray(trainers[name].fd.valid).sum())
        print(f"# {name}: compiled in {time.perf_counter() - t0:.1f}s",
              flush=True)

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
    base_med = None
    for name, ts in times.items():
        med = float(np.median(ts))
        out[f"{name}_round_ms"] = round(med * 1e3, 1)
        out[f"{name}_imgps"] = round(imgs / med, 1)
        if base_med is None:
            base_med = med
        out[f"{name}_speedup_vs_first"] = round(base_med / med, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
