#!/usr/bin/env python
"""A/B the depthwise-conv backends ('conv' grouped-conv lowering vs 'taps'
unrolled VPU shifts) inside the efficient_b0 train step on the current
backend. Syncs by reading back a result element (block_until_ready returns
early on the tunneled axon backend — BENCH_NOTES.md)."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sync(tree):
    import jax

    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, reps=7):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fedmlp_tpu.models.efficientnet import efficientnet_b0
    from fedmlp_tpu.models.factory import init_model
    from fedmlp_tpu.ops.losses import bce_with_logits
    from fedmlp_tpu.parallel.fl_runtime import torch_adam

    key = jax.random.PRNGKey(0)
    results = {"platform": jax.devices()[0].platform}

    models = {
        "conv": efficientnet_b0(5, dw_backend="conv"),
        "taps": efficientnet_b0(5, dw_backend="taps"),
    }
    variables = init_model(models["conv"], key, 224, batch=2)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    tx = torch_adam(3e-5)
    opt = tx.init(params)

    # (numerical equivalence is covered by tests/test_depthwise.py on CPU)

    # ---- step timings ----
    for name, model in models.items():
        @jax.jit
        def step(params, rest, opt, x, labels, key, model=model):
            def lf(p):
                (f, l), mut = model.apply(
                    {"params": p, **rest}, x, train=True,
                    mutable=["batch_stats"], rngs={"dropout": key})
                return bce_with_logits(l, labels).mean(), mut

            (loss, mut), grads = jax.value_and_grad(lf, has_aux=True)(params)
            upd, opt2 = tx.update(grads, opt, params)
            return optax.apply_updates(params, upd), mut, opt2, loss

        @jax.jit
        def fwd(params, rest, x, model=model):
            return model.apply({"params": params, **rest}, x,
                               train=False)[1]

        batches = tuple(int(b) for b in os.environ.get(
            "PROBE_BATCHES", "32").split(","))
        for B in batches:
            x = jnp.asarray(np.random.randn(B, 224, 224, 3), jnp.bfloat16)
            labels = jnp.zeros((B, 5), jnp.float32)
            dt = timeit(step, params, rest, opt, x, labels, key)
            results[f"step_{name}_B{B}_ms"] = round(dt * 1e3, 2)
            results[f"step_{name}_B{B}_imgps"] = round(B / dt, 1)
            if os.environ.get("PROBE_FWD"):
                dtf = timeit(fwd, params, rest, x)
                results[f"fwd_{name}_B{B}_ms"] = round(dtf * 1e3, 2)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
