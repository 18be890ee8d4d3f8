#!/usr/bin/env python
"""Isolate the fixmatch-at-scale TPU worker crash (round-3 session 5).

Observed: fixmatch K=20 B=32 224px crashes the TPU worker in round 0
(UNAVAILABLE: TPU worker process crashed), reproducibly, while fednoro
K=20 (lockstep, single view) and the fedmlp flagship run fine. Each probe
variant runs ONE round in its own process (a worker crash poisons the
client); this script is the single-variant runner.

Usage: python tools/probe_fixmatch_crash.py <variant>
Variants: fixmatch_k4, fixmatch_k20_gather, fixmatch_k20, fedavg_k20_mapped,
          fixmatch_k20_normonly
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


VARIANTS = {
    # (algo, K, augment_backend, batched_global)
    "fixmatch_k4": ("fixmatch", 4, "auto", "auto"),
    "fixmatch_k20": ("fixmatch", 20, "auto", "auto"),
    "fixmatch_k20_gather": ("fixmatch", 20, "gather", "auto"),
    "fixmatch_k20_normonly": ("fixmatch", 20, "normonly", "auto"),
    "fixmatch_k20_pallas": ("fixmatch", 20, "pallas", "auto"),
    "fixmatch_k20_paeth": ("fixmatch", 20, "paeth", "auto"),
    "fixmatch_k20_fused": ("fixmatch", 20, "fused", "auto"),
    "fixmatch_k12_fused": ("fixmatch", 12, "fused", "auto"),
    "fedavg_k20_mapped": ("fedavg", 20, "auto", "off"),
}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fedmlp_tpu.config import Config, DataConfig
    from fedmlp_tpu.train import Trainer

    variant = sys.argv[1]
    algo, K, backend, bg = VARIANTS[variant]
    B, SIZE = 32, 224
    data = DataConfig(name="synthetic", n_classes=8, image_size=SIZE,
                      synthetic_train_size=K * B * 2, synthetic_test_size=64)
    if backend != "auto":
        data = DataConfig(**{**data.__dict__, "augment_backend": backend})
    cfg = Config(
        algorithm=algo, model="efficient_b0", batch_size=B, base_lr=3e-5,
        n_clients=K, local_ep=1, rounds_warmup=4, eval_every=10_000,
        seed=1037, p_pos=0.0, data=data, compute_dtype="bfloat16",
        batched_global=bg,
    )
    t = Trainer(cfg)
    t.run_round(0)
    jax.block_until_ready(t.global_vars["params"])
    print(f"PROBE {variant}: PASS", flush=True)


if __name__ == "__main__":
    sys.exit(main())
