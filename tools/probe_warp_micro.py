#!/usr/bin/env python
"""Micro-decomposition of the fused warp kernel's ~26 us/image.

The round-4 flagship trace puts ops/pallas_warp.py::fused_warp_normalize
at 33.7 ms/step (1280 warps, #3 cost center). Warp v5 (wider shear
blocks, 2-4x fewer dynamic rolls) measured NEUTRAL end-to-end, leaving
"per-grid-step overhead and DMA" as an unverified residual hypothesis.
This probe times TIMING-ONLY kernel ablations (outputs are garbage for
every variant except `full`; never use these flags outside this probe)
to attribute the per-image cost:

  full        — the production kernel
  nozero      — skip the full-buffer zero inits (2 x 1.37 MB VMEM writes)
  notranspose — skip the two in-VMEM [3,S,S] swapaxes between passes
  notaps      — shear passes do the dynamic roll but sum raw taps with
                constant weights (no per-row compare/select coefficient
                math)
  noroll      — shear passes skip the dynamic roll (taps read from the
                unrolled buffer)
  empty       — kernel body = u8 load + normalize + store only (no shear
                passes): the DMA + cast + per-grid-step floor

Each variant runs as ONE vmapped pallas_call over B images (the same
lowering the training step uses: vmap -> leading grid dim), timed over
REPS synced calls after a warm-up. Interleaved per rep to cancel slice
drift, like tools/probe_flagship_ab.py.

Usage: WARP_B=256 WARP_REPS=20 python tools/probe_warp_micro.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VARIANTS = ("full", "empty", "nozero", "notranspose", "notaps", "noroll",
            "full2")


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fedmlp_tpu.ops import pallas_warp as pw

    B = int(os.environ.get("WARP_B", "256"))
    REPS = int(os.environ.get("WARP_REPS", "20"))
    S = int(os.environ.get("WARP_S", "224"))
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (B, S, S, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(7)

    fns = {}
    for name in VARIANTS:
        mode = "full" if name == "full2" else name
        pw._ABLATE = mode

        def f(images, k, _mode=mode):
            pw._ABLATE = _mode
            return pw.weak_augment_batch_fused(images, k, mean, std)

        fns[name] = jax.jit(f)
        out = fns[name](imgs, key)
        np.asarray(jax.device_get(out[0, 0, :1, 0]))  # sync compile
        pw._ABLATE = "full"
        print(f"# {name}: compiled", flush=True)

    times = {n: [] for n in VARIANTS}
    for _ in range(REPS):
        for name in VARIANTS:
            pw._ABLATE = "full" if name == "full2" else name
            t0 = time.perf_counter()
            out = fns[name](imgs, key)
            np.asarray(jax.device_get(out[0, 0, :1, 0]))
            times[name].append(time.perf_counter() - t0)
            pw._ABLATE = "full"

    res = {"B": B, "S": S, "reps": REPS,
           "platform": jax.devices()[0].platform}
    base = float(np.median(times["full"]))
    for name in VARIANTS:
        med = float(np.median(times[name]))
        res[f"{name}_us_per_img"] = round(med / B * 1e6, 3)
        res[f"{name}_vs_full"] = round(med / base, 4)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
