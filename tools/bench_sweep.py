#!/usr/bin/env python
"""Same-process throughput decomposition on the real chip (only
same-process interleaved timings are comparable on the tunneled slice —
BENCH_NOTES.md). Answers, with measurements:

  1. what a training step costs vs its two halves (augment-only,
     fwd/bwd-only on pre-augmented floats);
  2. how throughput scales with batch (32 -> 128) — dispatch floor vs
     compute bound;
  3. augment backend A/B (gather vs pallas 3-shear);
  4. FLOP scaling (efficient_b0 vs resnet18 vs smallcnn at the same pixel
     volume).

Usage: python tools/bench_sweep.py [quick]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _time(fn, *args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fedmlp_tpu.config import IMAGENET_MEAN, IMAGENET_STD
    from fedmlp_tpu.models import build_model
    from fedmlp_tpu.models.factory import init_model
    from fedmlp_tpu.ops import augment as A
    from fedmlp_tpu.ops.losses import bce_with_logits
    from fedmlp_tpu.parallel.fl_runtime import torch_adam
    import optax

    results = {}
    key = jax.random.PRNGKey(0)

    # ---- piece 1: augmentation alone (uint8 batch -> augmented floats) ----
    for B in (32, 128, 512):
        imgs = jnp.asarray(
            np.random.randint(0, 256, (B, 224, 224, 3), np.uint8))

        @jax.jit
        def aug(imgs, key):
            return A.weak_augment_batch(imgs, key, IMAGENET_MEAN, IMAGENET_STD)

        dt = _time(aug, imgs, key)
        results[f"augment_gather_B{B}_ms"] = round(dt * 1e3, 2)

        from fedmlp_tpu.ops.pallas_warp import weak_augment_batch_paeth

        @jax.jit
        def aug_p(imgs, key):
            return weak_augment_batch_paeth(imgs, key, IMAGENET_MEAN,
                                            IMAGENET_STD, use_pallas=True)

        try:
            dt = _time(aug_p, imgs, key)
            results[f"augment_pallas_B{B}_ms"] = round(dt * 1e3, 2)
        except Exception as e:  # pallas path may be unsupported on a backend
            results[f"augment_pallas_B{B}_ms"] = f"ERR {type(e).__name__}"

    # ---- piece 2: fwd+bwd+adam alone on pre-augmented floats ----
    for model_name in ("efficient_b0", "resnet18", "smallcnn"):
        model = build_model(model_name, 5)
        variables = init_model(model, key, 224, batch=2)
        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}
        tx = torch_adam(3e-5)
        opt = tx.init(params)
        labels32 = jnp.zeros((32, 5), jnp.float32)

        def make_step():
            @jax.jit
            def step(params, rest, opt, x, labels, key):
                def lf(p):
                    (f, l), mut = model.apply(
                        {"params": p, **rest}, x, train=True,
                        mutable=["batch_stats"], rngs={"dropout": key})
                    return bce_with_logits(l, labels).mean(), mut

                (loss, mut), grads = jax.value_and_grad(lf, has_aux=True)(params)
                upd, opt2 = tx.update(grads, opt, params)
                return optax.apply_updates(params, upd), mut, opt2, loss

            return step

        step = make_step()
        for B in (32, 128):
            x = jnp.asarray(np.random.randn(B, 224, 224, 3), jnp.bfloat16)
            labels = jnp.zeros((B, 5), jnp.float32)
            dt = _time(step, params, rest, opt, x, labels, key)
            results[f"train_step_{model_name}_B{B}_ms"] = round(dt * 1e3, 2)
            results[f"train_step_{model_name}_B{B}_imgps"] = round(B / dt, 1)
        if sys.argv[-1] == "quick":
            break

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
