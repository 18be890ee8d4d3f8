#!/usr/bin/env python
"""At-scale streamed dress rehearsal: 20-client FedMLP two-stage with the
full dataset host-streamed from disk — the execution mode built for
datasets larger than device HBM (ICH scale: 185,490 slices ≈ 27.9 GB of
224px uint8 images, reference preprocess/ICH_process.py:45-46, vs 16 GB
HBM on this chip).

The training rounds run in stream_window-step windows (only W·K·B images
resident in HBM; the native loader prefetches window w+1 while window w
trains — train.py::Trainer._windowed_pass), and the stage-transition /
stage-2 prototype harvests stream chunk-by-chunk through the same loader
(fl_runtime.make_harvest_fn). Records per-round wall time, host RSS and
device memory stats for RESULTS.md.

Usage:
  python tools/make_synth_shard.py --out /tmp/ich_scale --train 185490 \
      --test 10000 --classes 8 --size 224
  python tools/stream_rehearsal.py --root /tmp/ich_scale --rounds 4 \
      --stage1 2 --clients 20 --window 8
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def device_mem(jax) -> dict:
    try:
        st = jax.local_devices()[0].memory_stats() or {}
        return {
            "hbm_in_use_gb": round(st.get("bytes_in_use", 0) / 2**30, 2),
            "hbm_peak_gb": round(st.get("peak_bytes_in_use", 0) / 2**30, 2),
            "hbm_limit_gb": round(st.get("bytes_limit", 0) / 2**30, 2),
        }
    except Exception:
        return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="packed shard root "
                    "(make_synth_shard.py layout: train/ + test/)")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--stage1", type=int, default=2)
    ap.add_argument("--clients", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--model", default="efficient_b0")
    ap.add_argument("--eval_every", type=int, default=10_000)
    ap.add_argument("--rounds_per_proc", type=int, default=0,
                    help="relaunch a fresh worker process every N rounds. "
                    "The axon tunnel client retains ~1.05 B of host RSS per "
                    "byte transferred host->device, never released (measured "
                    "across chunk sizes, gc/malloc_trim/explicit delete — "
                    "device->host is clean); a full-dataset streamed round "
                    "leaks dataset-size RSS per pass. Bounded-lifetime "
                    "workers + bitwise checkpoint-resume cap the growth.")
    ap.add_argument("--ckpt_dir", default="/tmp/stream_rehearsal_ckpt")
    ap.add_argument("--start_round", type=int, default=0)
    ap.add_argument("--stop_round", type=int, default=0)
    ap.add_argument("--resume", default="")
    ap.add_argument("--_worker", action="store_true", help=argparse.SUPPRESS)
    a = ap.parse_args()

    if a.rounds_per_proc > 0 and not a._worker:
        import subprocess
        os.makedirs(a.ckpt_dir, exist_ok=True)
        base = [sys.executable, os.path.abspath(__file__),
                "--root", a.root, "--rounds", str(a.rounds),
                "--stage1", str(a.stage1), "--clients", str(a.clients),
                "--batch", str(a.batch), "--window", str(a.window),
                "--model", a.model, "--eval_every", str(a.eval_every),
                "--rounds_per_proc", str(a.rounds_per_proc),
                "--ckpt_dir", a.ckpt_dir, "--_worker"]
        r0, ckpt = a.start_round, a.resume
        while r0 < a.rounds:
            r1 = min(r0 + a.rounds_per_proc, a.rounds)
            cmd = base + ["--start_round", str(r0), "--stop_round", str(r1)]
            if ckpt:
                cmd += ["--resume", ckpt]
            subprocess.run(cmd, check=True)
            ckpt = os.path.join(a.ckpt_dir, f"ckpt_{r1 - 1}.pkl")
            r0 = r1
        return
    stop_round = a.stop_round or a.rounds

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fedmlp_tpu.config import Config, DataConfig, FedMLPConfig
    from fedmlp_tpu.data.datasets import load_packed_dataset
    from fedmlp_tpu.train import Trainer

    # mmap'd train images: the Trainer only reads targets from it (the
    # image bytes stream through the native loader), so the shard never
    # materializes in host RAM either
    train_ds = load_packed_dataset(os.path.join(a.root, "train"))
    test_ds = load_packed_dataset(os.path.join(a.root, "test"))
    n = len(train_ds)
    print(json.dumps({"event": "data", "train_n": n, "test_n": len(test_ds),
                      "train_gb": round(train_ds.images.nbytes / 2**30, 2),
                      "rss_gb": round(rss_gb(), 2)}), flush=True)

    cfg = Config(
        algorithm="fedmlp",
        model=a.model,
        batch_size=a.batch,
        base_lr=3e-5,
        n_clients=a.clients,
        local_ep=1,
        rounds_warmup=a.rounds,
        eval_every=a.eval_every,
        seed=1037,
        p_pos=0.0,
        fedmlp=FedMLPConfig(rounds_stage1=a.stage1),
        data=DataConfig(
            name="synthetic", n_classes=train_ds.n_classes, image_size=224,
            host_stream=True, stream_window=a.window,
        ),
        compute_dtype="bfloat16",
        output_dir="",
    )
    t0 = time.perf_counter()
    t = Trainer(cfg, train_ds=train_ds, test_ds=test_ds,
                images_npy=os.path.join(a.root, "train", "images.npy"))
    assert t.fd.images is None, "dataset must NOT be device-resident"
    if a.resume:
        from fedmlp_tpu.utils.checkpoint import load_checkpoint
        got = load_checkpoint(a.resume, t)
        assert got == a.start_round, (got, a.start_round)
    engine = "lockstep" if t._use_lockstep() else "mapped"
    print(json.dumps({"event": "init", "seconds": round(
        time.perf_counter() - t0, 1), "engine": engine,
        "start_round": a.start_round, "stop_round": stop_round,
        "steps_per_round": int(np.ceil(
            np.asarray(t.fd.n_local).max() / a.batch)),
        "window": a.window, "rss_gb": round(rss_gb(), 2),
        **device_mem(jax)}), flush=True)

    for rnd in range(a.start_round, stop_round):
        t0 = time.perf_counter()
        rec = t.run_round(rnd)
        jax.block_until_ready(t.global_vars["params"])
        dt = time.perf_counter() - t0
        row = {
            "event": "round", "round": rnd,
            "stage": 1 if rnd < a.stage1 else 2,
            "seconds": round(dt, 1),
            "img_per_s": round(n / dt, 1),
            "mean_loss": round(float(np.mean(rec.client_losses)), 4),
            "tags": int((t.server_state["tags"] > 0).sum()),
            "rss_gb": round(rss_gb(), 2),
            **device_mem(jax),
        }
        if rec.metrics:
            row["auc"] = round(float(rec.metrics["auc"]), 4)
        print(json.dumps(row), flush=True)

    if a._worker:
        from fedmlp_tpu.utils.checkpoint import save_checkpoint
        fname = save_checkpoint(a.ckpt_dir, t, stop_round - 1)
        print(json.dumps({"event": "ckpt", "path": fname,
                          "rss_gb": round(rss_gb(), 2)}), flush=True)
    if stop_round == a.rounds:
        m = t.evaluate()
        print(json.dumps({"event": "final_eval",
                          **{k: round(float(v), 4) for k, v in m.items()
                             if np.isscalar(v) or np.ndim(v) == 0}}),
              flush=True)


if __name__ == "__main__":
    main()
