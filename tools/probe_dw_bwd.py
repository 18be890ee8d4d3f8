#!/usr/bin/env python
"""A/B depthwise-conv BACKWARD formulations per b0 shape on the current
backend.

The round-3 flagship profile (BENCH_NOTES.md) shows dw-conv backward ops
at 169-450 GB/s with ~2.3x ideal bytes — 144 ms of the 536 ms stage-1
step — while the XLA *forward* dw conv runs at near-ideal bytes. The
hypothesis: XLA's native dw VJP lowers the weight-gradient as a
pathological convolution, and rerouting dx through the fast forward-conv
emitter (conv of dy with spatially flipped weights) plus a taps-reduce
weight-gradient wins.

Candidates, timed as value_and_grad of sum(dwconv(x, w)) so both dx and
dw are computed:
  native : jax's own VJP of lax.conv_general_dilated(fgc=C)
  reroute: custom_vjp — dx = conv(dy_dilated, flip(w), fgc=C),
           dw = k^2 shifted multiply+reduce taps (one XLA fusion)
Timings sync by reading back a result element (block_until_ready returns
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


def timeit_interleaved(fns, args, reps=9):
    """Alternate candidates rep-by-rep to cancel slice-weather drift."""
    ts = {k: [] for k in fns}
    for k, fn in fns.items():
        sync(fn(*args))  # compile
    for _ in range(reps):
        for k, fn in fns.items():
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            ts[k].append(time.perf_counter() - t0)
    return {k: float(np.median(v)) for k, v in ts.items()}


# b0 dw shapes: (H, C, k, stride) at the flagship's per-client batch
SHAPES = [
    (112, 32, 3, 1),    # block0_0
    (112, 96, 3, 2),    # block1_0
    (56, 144, 3, 1),    # block1_1
    (56, 144, 5, 2),    # block2_0
    (28, 240, 5, 1),    # block2_1
    (28, 240, 3, 2),    # block3_0
    (14, 480, 3, 1),    # block3_1
    (14, 672, 5, 1),    # block4_1
    (14, 672, 5, 2),    # block5_0
    (7, 1152, 5, 1),    # block5_1
    (7, 1152, 3, 1),    # block6_0
]


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fedmlp_tpu.ops.dw_conv import dw_conv, dw_conv_xla
    from fedmlp_tpu.ops.dw_pallas import dw_conv_pallas, flat_supported
    from fedmlp_tpu.models.efficientnet import _same_pads

    B = int(os.environ.get("PROBE_B", "32"))
    results = {"platform": jax.devices()[0].platform, "B": B}
    for H, C, k, s in SHAPES:
        pads = (_same_pads(H, k, s), _same_pads(H, k, s))
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, H, H, C), jnp.bfloat16)
        w = jax.random.normal(key, (k, k, 1, C), jnp.float32)

        REPS = 50

        def make(fn):
            # chain REPS full (dx, dw) backwards inside ONE program so the
            # ~30 ms tunneled-call floor amortizes away (BENCH_NOTES.md)
            @jax.jit
            def step(x, w):
                def body(carry, _):
                    x, w = carry

                    def lf(x, w):
                        y = fn(x, w, s, pads).astype(jnp.float32)
                        # sum(y*y): a data-dependent cotangent (dy = y) so
                        # neither the forward nor the wgrad can fold away
                        return 0.5 * jnp.sum(y * y)

                    dx, dw_ = jax.grad(lf, argnums=(0, 1))(x, w)
                    return (x + 1e-6 * dx, w + 1e-6 * dw_), None

                (x, w), _ = jax.lax.scan(body, (x, w), None, length=REPS)
                return x, w

            return step

        w = w.astype(jnp.bfloat16)
        fns = {"native": make(dw_conv_xla), "reroute": make(dw_conv)}
        if flat_supported(H, H, C):
            fns["pallas"] = make(
                lambda x, w, s, pads: dw_conv_pallas(x, w, s, pads, False))
        med = timeit_interleaved(fns, (x, w))
        med = {k2: v / REPS for k2, v in med.items()}
        tag = f"H{H}_C{C}_k{k}_s{s}"
        for k2, v in med.items():
            results[f"{tag}_{k2}_ms"] = round(v * 1e3, 3)
        results[f"{tag}_speedup"] = round(
            med["native"] / min(v for k2, v in med.items() if k2 != "native"),
            3)
        print(tag, {k2: round(v * 1e3, 2) for k2, v in med.items()},
              "speedup", results[f"{tag}_speedup"], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
