#!/usr/bin/env python
"""Primitive probe for PARTIAL client grouping (VERDICT round-4 item 1).

The lockstep engine's per-step lax.map runs each client's grad step as a
standalone small program; the round-4 HLO study showed XLA lays the C≤32
activations batch-minor, so at the flagship's 2B=64 student batch every
early conv runs at 64/128 lane occupancy. models/stacked.py implements
EXACT grouped execution (grouped dw conv, block-diag/grouped 1x1, stacked
BN) — full-K stacking lost end-to-end in round 2 (hand-written BN breaks
XLA's conv-BN fusions), but G=2..4 clients per map element is a different
operating point nobody measured.

This probe times the flagship-shaped unit: G clients' grad steps on
EfficientNet-B0 @ 224px, batch 2B=64 (viewcat student forward), bf16:

  mapped  — lax.map over G clients, plain flax apply (today's engine unit)
  stacked — ONE stacked_apply grad step of the G-client group

Each candidate runs ITERS times inside one lax.scan (amortizes the ~30 ms
tunnel dispatch floor), interleaved rep-by-rep to cancel slice drift.

Env: PROBE_G (default "2,4"), PROBE_B (default 64), PROBE_ITERS (8).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ITERS = int(os.environ.get("PROBE_ITERS", "8"))


def sync(tree):
    import jax

    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fedmlp_tpu.models import build_model
    from fedmlp_tpu.models.factory import init_model
    from fedmlp_tpu.models.stacked import stacked_apply
    from fedmlp_tpu.parallel.fl_runtime import broadcast_to_clients

    B = int(os.environ.get("PROBE_B", "64"))
    IMG = int(os.environ.get("PROBE_IMG", "224"))
    C = 8
    groups = [int(g) for g in os.environ.get("PROBE_G", "2,4").split(",")]

    model = build_model("efficient_b0", C, compute_dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.PRNGKey(0), IMG, batch=2)

    rng = np.random.RandomState(0)

    def make_candidates(G):
        svars = broadcast_to_clients(variables, G)
        # jitter the clients apart so no degenerate sharing
        svars = jax.tree_util.tree_map(
            lambda x: x * (1.0 + 0.01 * jnp.arange(G).reshape(
                (G,) + (1,) * (x.ndim - 1))).astype(x.dtype)
            if x.dtype == jnp.float32 else x, svars)
        x = jnp.asarray(rng.rand(G, B, IMG, IMG, 3), jnp.float32)
        y = jnp.asarray((rng.rand(G, B, C) > 0.5), jnp.float32)

        def loss_mapped(params_k, rest_k, x_k, y_k):
            vars_k = dict(rest_k)
            vars_k["params"] = params_k
            (feat, logits), new_rest = model.apply(
                vars_k, x_k, train=True,
                rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"])
            p = jax.nn.sigmoid(logits)
            return jnp.mean((p - y_k) ** 2)

        def step_mapped(svars_in, _):
            def one(args):
                vars_k, x_k, y_k = args
                params = vars_k["params"]
                rest = {k: v for k, v in vars_k.items() if k != "params"}
                g = jax.grad(loss_mapped)(params, rest, x_k, y_k)
                return g

            grads = jax.lax.map(one, (svars_in, x, y))
            new = dict(svars_in)
            new["params"] = jax.tree_util.tree_map(
                lambda p, g: p - 1e-6 * g.astype(p.dtype),
                svars_in["params"], grads)
            return new, 0.0

        def loss_stacked(params_s, rest_s):
            vars_s = dict(rest_s)
            vars_s["params"] = params_s
            (feat, logits), _ = stacked_apply(
                model, vars_s, x, train=True, rng=jax.random.PRNGKey(1))
            p = jax.nn.sigmoid(logits)
            return jnp.mean((p - y) ** 2)

        def step_stacked(svars_in, _):
            params = svars_in["params"]
            rest = {k: v for k, v in svars_in.items() if k != "params"}
            g = jax.grad(loss_stacked)(params, rest)
            new = dict(svars_in)
            new["params"] = jax.tree_util.tree_map(
                lambda p, gg: p - 1e-6 * gg.astype(p.dtype), params, g)
            return new, 0.0

        @jax.jit
        def run_mapped(sv):
            out, _ = jax.lax.scan(step_mapped, sv, None, length=ITERS)
            return out

        @jax.jit
        def run_stacked(sv):
            out, _ = jax.lax.scan(step_stacked, sv, None, length=ITERS)
            return out

        return svars, run_mapped, run_stacked

    out = {"B": B, "img": IMG, "iters": ITERS,
           "platform": jax.devices()[0].platform}
    for G in groups:
        svars, run_mapped, run_stacked = make_candidates(G)
        # compile both
        for name, fn in [("mapped", run_mapped), ("stacked", run_stacked)]:
            t0 = time.perf_counter()
            sync(fn(svars))
            print(f"# G={G} {name}: compiled+first in "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
        times = {"mapped": [], "stacked": []}
        for _ in range(4):
            for name, fn in [("mapped", run_mapped), ("stacked", run_stacked)]:
                t0 = time.perf_counter()
                sync(fn(svars))
                times[name].append(time.perf_counter() - t0)
        m = float(np.median(times["mapped"])) / ITERS
        s = float(np.median(times["stacked"])) / ITERS
        out[f"G{G}_mapped_ms"] = round(m * 1e3, 2)
        out[f"G{G}_stacked_ms"] = round(s * 1e3, 2)
        out[f"G{G}_stacked_speedup"] = round(m / s, 4)
        print(json.dumps({k: v for k, v in out.items() if f"G{G}" in k}),
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
