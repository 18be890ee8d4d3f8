#!/usr/bin/env python
"""Minimal repro for the fixmatch-at-scale TPU worker crash.

The full-trainer probe (probe_fixmatch_crash.py) shows: fused weak backend
+ strong view + K=20 (K·B=640) crashes the worker; K≤12 and every other
backend pass. This strips the trainer away: one jitted program combining
the fused Pallas warp and the gather-based strong augmentation at a given
flat batch, optionally with a conv grad after, to bisect which ingredient
kills the worker.

Usage: python tools/probe_fused_strong_mini.py <variant> [N]
Variants:
  fused        — fused weak warp alone at N images
  strong       — strong augmentation alone at N
  fused_strong — both in one program
  fused_strong_grad — both + a tiny conv grad through the views
Default N=640.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))

    from fedmlp_tpu.ops import augment as A
    from fedmlp_tpu.ops.pallas_warp import weak_augment_batch_fused

    variant = sys.argv[1]
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    imgs = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (N, 224, 224, 3), np.uint8))
    key = jax.random.PRNGKey(0)

    def weak(x, k):
        return weak_augment_batch_fused(x, k, mean, std, use_pallas=True)

    def strong(x, k):
        return A.strong_augment_batch(x, k, mean, std)

    if variant == "fused":
        fn = jax.jit(lambda x, k: weak(x, k).sum())
    elif variant == "strong":
        fn = jax.jit(lambda x, k: strong(x, k).sum())
    elif variant == "fused_strong":
        fn = jax.jit(
            lambda x, k: weak(x, k).sum() + strong(x, jax.random.fold_in(k, 1)).sum())
    elif variant == "fused_strong_grad":
        w0 = jnp.ones((3, 3, 3, 8), jnp.float32) * 0.01

        def loss(w, x, k):
            v1 = weak(x, k)
            v2 = strong(x, jax.random.fold_in(k, 1))
            y1 = jax.lax.conv_general_dilated(
                v1, w, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y2 = jax.lax.conv_general_dilated(
                v2, w, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return (y1 ** 2).mean() + (y2 ** 2).mean()

        fn = jax.jit(jax.grad(loss))
        out = fn(w0, imgs, key)
        print("PASS", variant, N, np.asarray(out).ravel()[:2])
        return
    else:
        raise SystemExit(f"unknown variant {variant}")

    out = fn(imgs, key)
    print("PASS", variant, N, float(np.asarray(out)))


if __name__ == "__main__":
    main()
