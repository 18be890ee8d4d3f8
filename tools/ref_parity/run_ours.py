#!/usr/bin/env python
"""Head-to-head parity: fedmlp_tpu on the shared fixture (see common.py),
CPU backend, augmentation normonly (both views identity — the fixture's
torch side is identity too), initial weights identical to the reference
run (converted torch init). Writes outputs/ref_parity/ours_<exp>[_sN].jsonl
in the same schema as run_reference.py.

Usage: python tools/ref_parity/run_ours.py
           {FedAVG|FedMLP|FedNoRo|CBAFed|FedAVG+FixMatch} [--seed N]

``--seed N`` varies only the training-order randomness (batch-plan
permutations + jax PRNG streams) on the fixed fixture/partition/init —
the noise floor the cross-framework comparison is judged against.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..")))
from tools.ref_parity import common as C

ALGO = {
    "FedAVG": "fedavg",
    "FedMLP": "fedmlp",
    "FedNoRo": "fednoro",
    "CBAFed": "cbafed",
    "FedAVG+FixMatch": "fixmatch",
}


def main():
    exp = sys.argv[1] if len(sys.argv) > 1 else "FedMLP"
    assert exp in ALGO
    seed_off = 0
    if "--seed" in sys.argv:
        seed_off = int(sys.argv[sys.argv.index("--seed") + 1])
    import jax

    jax.config.update("jax_platforms", "cpu")
    # One suite run = one fresh subprocess (bounded RSS on the 1-core
    # host); without a persistent cache every run re-compiles ~25 min of
    # CPU programs. The cache is keyed by backend+program, so repeat
    # seeds hit it outright and sibling algorithms share eval programs.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(C.REPO, ".jax_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fedmlp_tpu.config import Config, DataConfig, FedMLPConfig
    from fedmlp_tpu.train import Trainer

    tr, te, dict_users, _hidden = C.fixture()
    _pt, npz = C.ensure_init()

    cfg = Config(
        algorithm=ALGO[exp],
        model="resnet18", batch_size=C.BATCH, base_lr=C.BASE_LR,
        n_clients=C.N_CLIENTS, local_ep=C.LOCAL_EP, rounds_warmup=C.ROUNDS,
        eval_every=C.EVAL_EVERY, seed=C.SEED + seed_off, p_pos=0.0,
        fedmlp=FedMLPConfig(rounds_stage1=C.STAGE1, clean_threshold=0.05,
                            noise_threshold=0.1),
        data=DataConfig(name="synthetic", n_classes=C.N_CLASSES,
                        image_size=C.IMAGE, augment_backend="normonly",
                        mean=C.MEAN, std=C.STD),
        compute_dtype="float32", pretrained_path=npz, output_dir="",
    )
    t = Trainer(cfg, train_ds=tr, test_ds=te, dict_users=dict_users,
                use_mesh=False)

    records = []
    for rnd in range(C.ROUNDS):
        t0 = time.time()
        rec = t.run_round(rnd)
        out = {"round": rnd, "losses": list(map(float, rec.client_losses)),
               "seconds": time.time() - t0}
        if rec.metrics is None and ((rnd + 1) % C.EVAL_EVERY == 0
                                    or rnd == C.ROUNDS - 1):
            rec.metrics = t.evaluate()
        if rec.metrics is not None:
            out["metrics"] = {k: float(v) for k, v in rec.metrics.items()}
            print(f"[ours {exp}] round {rnd}: {out['metrics']}", flush=True)
        records.append(out)
        print(f"[ours {exp}] round {rnd} done {out['seconds']:.1f}s "
              f"loss={np.mean(out['losses']):.4f}", flush=True)

    os.makedirs(C.OUT, exist_ok=True)
    suffix = f"_s{seed_off}" if seed_off else ""
    C.write_jsonl(os.path.join(C.OUT, f"ours_{exp}{suffix}.jsonl"), records)


if __name__ == "__main__":
    main()
