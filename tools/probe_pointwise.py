#!/usr/bin/env python
"""Pointwise (1x1) per-client conv formulations ON THE STACKED LAYOUT
[B,H,W,K*C] — the einsum/batched-matmul form forces K-leading transposes
around every layer (measured 18.4 ms/step of pure data formatting), so the
candidates here avoid relayout entirely:

  einsum  — current: reshape to [B,H,W,K,Ci], batched dot_general (baseline)
  grouped — lax.conv feature_group_count=K, kernel [1,1,Ci,K*Co]
  blockdiag — one dense [K*Ci, K*Co] matmul (4x FLOPs, zero structure)

fwd+bwd per iteration, serialized scan (see probe_stacked.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ITERS = 24


def sync(tree):
    import jax

    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def looped(step):
    import jax

    @jax.jit
    def run(x, w):
        def body(carry, _):
            x, w = carry
            loss, g = step(x, w)
            w2 = jax.tree_util.tree_map(
                lambda a, b: a + 1e-6 * b.astype(a.dtype), w, g)
            return (x, w2), loss

        (_, w_out), losses = jax.lax.scan(body, (x, w), None, length=ITERS)
        return losses.sum(), w_out

    return run


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    K, B = 4, 32
    results = {"platform": jax.devices()[0].platform, "K": K, "B": B}
    rs = np.random.RandomState(0)

    def report(tag, fn, *args):
        dt = timeit(fn, *args)
        results[tag] = round(dt * 1e3 / ITERS, 3)
        print(json.dumps({tag: results[tag]}), flush=True)

    for H, Ci, Co in ((112, 16, 96), (112, 96, 24), (56, 144, 24),
                      (14, 480, 112), (7, 320, 1280)):
        x = jnp.asarray(rs.randn(B, H, H, K * Ci), jnp.bfloat16)
        w = jnp.asarray(rs.randn(K, Ci, Co), jnp.bfloat16)
        wbd = jnp.asarray(rs.randn(K * Ci, K * Co), jnp.bfloat16)

        def einsum_step(x, w):
            def loss(w):
                x5 = x.reshape(B, H, H, K, Ci)
                y = jnp.einsum("bhwkc,kcd->bhwkd", x5, w)
                return (y.astype(jnp.float32) ** 2).sum()
            return jax.value_and_grad(loss)(w)

        def grouped_step(x, w):
            def loss(w):
                rhs = jnp.transpose(w, (1, 0, 2)).reshape(1, 1, Ci, K * Co)
                y = jax.lax.conv_general_dilated(
                    x, rhs, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=K)
                return (y.astype(jnp.float32) ** 2).sum()
            return jax.value_and_grad(loss)(w)

        def blockdiag_step(x, w):
            def loss(w):
                y = jax.lax.dot_general(
                    x.reshape(-1, K * Ci), w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.bfloat16)
                return (y.astype(jnp.float32) ** 2).sum()
            return jax.value_and_grad(loss)(w)

        tag = f"pw_H{H}_{Ci}to{Co}"
        report(f"{tag}_einsum", looped(einsum_step), x, w)
        report(f"{tag}_grouped", looped(grouped_step), x, w)
        report(f"{tag}_blockdiag", looped(blockdiag_step), x, wbd)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
