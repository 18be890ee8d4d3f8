#!/usr/bin/env python
"""A/B the fused conv1x1+BN-stats prototype against XLA's conv → stats
pair on the bench round's hottest pointwise shape (block1_0 expand:
[32·112·112, 16] @ [16, 96]). Looped scan timing (see probe_stacked.py);
read-back sync."""

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


def timeit_interleaved(fns, args, reps=7):
    """Alternate the candidates rep-by-rep so slice-weather drift hits
    them equally (single-shot A-then-B orderings measured ±30% flips
    between sessions)."""
    for fn in fns:
        sync(fn(*args))
    ts = [[] for _ in fns]
    for _ in range(reps):
        for i, fn in enumerate(fns):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            ts[i].append(time.perf_counter() - t0)
    return [float(np.median(t)) for t in ts]


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fused_conv_bn import conv1x1_bn_stats

    results = {"platform": jax.devices()[0].platform, "iters": ITERS}
    rs = np.random.RandomState(0)
    for M, Ci, Co in ((32 * 112 * 112, 16, 96), (32 * 56 * 56, 24, 144),
                      (32 * 14 * 14, 80, 480)):
        x = jnp.asarray(rs.randn(M, Ci), jnp.bfloat16)
        w = jnp.asarray(rs.randn(Ci, Co), jnp.bfloat16)

        @jax.jit
        def xla_pair(x, w):
            def body(carry, _):
                x, w = carry
                y = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
                yf = y.astype(jnp.float32)
                s = yf.sum(0)
                ss = (yf * yf).sum(0)
                w2 = w + 1e-9 * jnp.outer(x[0, :].astype(w.dtype),
                                          y[0, :].astype(w.dtype)) \
                    + (1e-12 * ss.sum()).astype(w.dtype)
                return (x, w2), s[0]

            (_, w_out), out = jax.lax.scan(body, (x, w), None, length=ITERS)
            return out.sum(), w_out

        @jax.jit
        def fused(x, w):
            def body(carry, _):
                x, w = carry
                y, s, ss = conv1x1_bn_stats(x, w, interpret=False)
                w2 = w + 1e-9 * jnp.outer(x[0, :].astype(w.dtype),
                                          y[0, :].astype(w.dtype)) \
                    + (1e-12 * ss.sum()).astype(w.dtype)
                return (x, w2), s[0]

            (_, w_out), out = jax.lax.scan(body, (x, w), None, length=ITERS)
            return out.sum(), w_out

        scale = jnp.asarray(rs.rand(Co) + 0.5, jnp.float32)
        bias = jnp.asarray(rs.randn(Co), jnp.float32)

        @jax.jit
        def xla_full(x, w):
            def body(carry, _):
                x, w = carry
                y = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
                yf = y.astype(jnp.float32)
                m = yf.mean(0)
                v = jnp.maximum((yf * yf).mean(0) - m * m, 0.0)
                z = (yf - m) * jax.lax.rsqrt(v + 1e-3) * scale + bias
                out = (z * jax.nn.sigmoid(z)).astype(x.dtype)
                w2 = w + 1e-9 * jnp.outer(x[0, :].astype(w.dtype), out[0, :])
                return (x, w2), m[0]

            (_, w_out), out = jax.lax.scan(body, (x, w), None, length=ITERS)
            return out.sum(), w_out

        @jax.jit
        def fused_2pass(x, w):
            from fused_conv_bn import conv1x1_bn_act_2pass

            def body(carry, _):
                x, w = carry
                out, m, v = conv1x1_bn_act_2pass(x, w, scale, bias,
                                                 interpret=False)
                w2 = w + 1e-9 * jnp.outer(x[0, :].astype(w.dtype), out[0, :])
                return (x, w2), m[0]

            (_, w_out), out = jax.lax.scan(body, (x, w), None, length=ITERS)
            return out.sum(), w_out

        tag = f"M{M}_{Ci}to{Co}"
        t_xla, t_fused, t_full, t_2p = timeit_interleaved(
            (xla_pair, fused, xla_full, fused_2pass), (x, w))
        results[f"{tag}_xla_ms"] = round(t_xla * 1e3 / ITERS, 3)
        results[f"{tag}_fused_ms"] = round(t_fused * 1e3 / ITERS, 3)
        results[f"{tag}_xlafull_ms"] = round(t_full * 1e3 / ITERS, 3)
        results[f"{tag}_fused2p_ms"] = round(t_2p * 1e3 / ITERS, 3)
        print(json.dumps({k: v for k, v in results.items() if tag in k}),
              flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
