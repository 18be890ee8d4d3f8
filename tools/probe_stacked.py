#!/usr/bin/env python
"""Primitive-level probe for the channel-stacked-clients formulation.

Each candidate op runs ITERS times inside one lax.scan program (the
~30 ms per-dispatch floor of the tunneled slice would otherwise drown the
compute — BENCH_NOTES.md), serialized through the carry so XLA can't hoist
it. Reported: ms per iteration (fwd+bwd through the op).

  dw  — K per-client depthwise convs: lax.map vs one fgc=K*C conv
  pw  — K per-client 1x1 convs: lax.map vs K-batched dot_general
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
    """step(x, w) -> (loss, grads); serialize ITERS of them via the carry."""
    import jax
    import jax.numpy as jnp

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
    results = {"platform": jax.devices()[0].platform, "K": K, "B": B,
               "iters": ITERS}
    rs = np.random.RandomState(0)

    def report(tag, fn, *args):
        dt = timeit(fn, *args)
        results[f"{tag}_ms_per_iter"] = round(dt * 1e3 / ITERS, 3)
        print(json.dumps({tag: results[f"{tag}_ms_per_iter"]}), flush=True)

    # ---- depthwise: hot B0 shapes ----
    for H, C, kk, s in ((112, 32, 3, 1), (112, 96, 3, 2), (56, 144, 3, 1),
                        (28, 240, 5, 1)):
        x = jnp.asarray(rs.randn(K, B, H, H, C), jnp.bfloat16)
        w = jnp.asarray(rs.randn(K, kk, kk, 1, C), jnp.bfloat16)
        xs = jnp.asarray(
            np.moveaxis(np.asarray(x, np.float32), 0, 3).reshape(
                B, H, H, K * C), jnp.bfloat16)
        ws = jnp.asarray(
            np.moveaxis(np.asarray(w, np.float32), 0, 3).reshape(
                kk, kk, 1, K * C), jnp.bfloat16)

        def dw(xk, wk, c):
            return jax.lax.conv_general_dilated(
                xk, wk, (s, s), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)

        def map_step(x, w):
            def loss(w):
                y = jax.lax.map(lambda a: dw(a[0], a[1], C), (x, w))
                return (y.astype(jnp.float32) ** 2).sum()
            return jax.value_and_grad(loss)(w)

        def stacked_step(xs, ws):
            def loss(ws):
                y = dw(xs, ws, K * C)
                return (y.astype(jnp.float32) ** 2).sum()
            return jax.value_and_grad(loss)(ws)

        tag = f"dw_H{H}_C{C}_k{kk}_s{s}"
        report(f"{tag}_map", looped(map_step), x, w)
        report(f"{tag}_stacked", looped(stacked_step), xs, ws)

    # ---- pointwise 1x1 ----
    for H, Ci, Co in ((112, 16, 96), (112, 96, 24), (14, 480, 112)):
        x = jnp.asarray(rs.randn(K, B, H, H, Ci), jnp.bfloat16)
        w = jnp.asarray(rs.randn(K, Ci, Co), jnp.bfloat16)
        xm = x.reshape(K, B * H * H, Ci)

        def map_pw(x, w):
            def loss(w):
                def one(args):
                    xk, wk = args
                    return jax.lax.conv_general_dilated(
                        xk, wk[None, None], (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = jax.lax.map(one, (x, w))
                return (y.astype(jnp.float32) ** 2).sum()
            return jax.value_and_grad(loss)(w)

        def bmm_pw(xm, w):
            def loss(w):
                y = jax.lax.dot_general(
                    xm, w, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                return (y ** 2).sum()
            return jax.value_and_grad(loss)(w)

        tag = f"pw_H{H}_{Ci}to{Co}"
        report(f"{tag}_map", looped(map_pw), x, w)
        report(f"{tag}_bmm", looped(bmm_pw), xm, w)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
