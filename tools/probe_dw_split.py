#!/usr/bin/env python
"""Split the depthwise backward cost: fwd only, fwd+dx, fwd+dwgrad,
fwd+both — native XLA VJP vs rerouted pieces (ops/dw_conv.py), looped
scan per candidate to amortize the ~30 ms tunneled-call floor."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sync(x):
    import jax

    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fedmlp_tpu.ops.dw_conv import (dw_conv_xla, _dx_via_fwd,
                                        _dw_grad_taps)
    from fedmlp_tpu.models.efficientnet import _same_pads

    B = int(os.environ.get("PROBE_B", "32"))
    H, C, k, s = [int(v) for v in os.environ.get(
        "PROBE_SHAPE", "112,32,3,1").split(",")]
    pads = (_same_pads(H, k, s), _same_pads(H, k, s))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, H, C), jnp.bfloat16)
    w = jax.random.normal(key, (k, k, 1, C), jnp.bfloat16)
    REPS = 50

    def scanned(body):
        @jax.jit
        def run(x, w):
            return jax.lax.scan(lambda c, _: (body(*c), None), (x, w),
                                None, length=REPS)[0]
        return run

    # every candidate computes y and uses it as the cotangent, so neither
    # the forward nor the backward piece can be DCE'd or constant-folded
    assert s == 1, "split probe assumes stride 1 (y.shape == x.shape)"

    def fwd_only(x, w):
        y = dw_conv_xla(x, w, s, pads)
        return x + 1e-6 * y, w

    def native_dx(x, w):
        y, vjp = jax.vjp(lambda x: dw_conv_xla(x, w, s, pads), x)
        (dx,) = vjp(y)
        return x + 1e-6 * dx, w

    def native_dw(x, w):
        y, vjp = jax.vjp(lambda w: dw_conv_xla(x, w, s, pads), w)
        (dw_,) = vjp(y)
        return x + 1e-6 * y, w + 1e-6 * dw_

    def reroute_dx(x, w):
        y = dw_conv_xla(x, w, s, pads)
        dx = _dx_via_fwd(y, w, s, pads, C)
        return x + 1e-6 * dx.astype(x.dtype), w

    def reroute_dw(x, w):
        y = dw_conv_xla(x, w, s, pads)
        dw_ = _dw_grad_taps(x, y, k, s, pads)
        return x + 1e-6 * y, w + 1e-6 * dw_.astype(w.dtype)

    cands = {"fwd": fwd_only, "native_dx": native_dx,
             "native_dw": native_dw, "reroute_dx": reroute_dx,
             "reroute_dw": reroute_dw}
    fns = {n: scanned(b) for n, b in cands.items()}
    for f in fns.values():
        sync(f(x, w))
    ts = {n: [] for n in fns}
    for _ in range(7):
        for n, f in fns.items():
            t0 = time.perf_counter()
            sync(f(x, w))
            ts[n].append(time.perf_counter() - t0)
    out = {"shape": f"H{H}_C{C}_k{k}_s{s}", "B": B}
    for n, v in ts.items():
        out[n + "_ms"] = round(float(np.median(v)) / REPS * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
