#!/usr/bin/env python
"""A/B the EfficientNet-B0 EARLY-STAGE chain (stem + stage0 + stage1) in
NHWC vs NCHW data format, fwd+bwd, at the flagship's viewcat batch.

Motivation (round-4 HLO study, BENCH_NOTES.md): XLA lays the early
small-C activations BATCH-minor — [64,112,112,16]{0,3,2,1} puts B=64 in
the 128-lane tile (2x padding waste at viewcat batch; C=96 fills 96/128;
C=144 pads to 256). The conv-backward byte inflation (2-3.5x ideal) is a
LAYOUT property, so the lever must change the shapes XLA lays out. NCHW
puts W=112/56 in lanes (87.5%+ utilization) for every early activation.

This probe measures the isolated early chain (stem conv, block0_0
dw+project, block1_0 expand+dw(s2)+project, block1_1 expand+dw+project
+residual, inline batch-stats BN + swish after every conv, SE omitted)
as value_and_grad wrt params, R iterations chained in-program via a
param-update carry so the ~30 ms tunnel call floor amortizes. Timings
sync by result readback (block_until_ready lies on the tunneled
backend). Caveat per the round-3 lesson: isolated-op wins have twice
evaporated in the integrated round — a positive here only JUSTIFIES the
model-integration A/B, it does not decide it.

Usage: python tools/probe_nchw_early.py   # env: PROBE_B, PROBE_REPS
"""

from __future__ import annotations

import functools
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


def build(fmt: str):
    """Return (init_params, step_fn) for the early chain in `fmt`."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    assert fmt in ("nhwc", "nchw")
    C_AX = 3 if fmt == "nhwc" else 1
    DN = ("NHWC", "HWIO", "NHWC") if fmt == "nhwc" else ("NCHW", "HWIO", "NCHW")

    def conv(x, w, stride=1, groups=1):
        return lax.conv_general_dilated(
            x, w.astype(x.dtype), (stride, stride), "SAME",
            dimension_numbers=DN, feature_group_count=groups)

    def bn_swish(x, scale, bias, swish=True):
        ax = tuple(i for i in range(4) if i != C_AX)
        mean = jnp.mean(x, axis=ax, keepdims=True)
        var = jnp.mean(jnp.square(x), axis=ax, keepdims=True) - mean * mean
        shp = [1, 1, 1, 1]
        shp[C_AX] = -1
        y = (x - mean) * lax.rsqrt(var + 1e-3)
        y = y * scale.reshape(shp).astype(x.dtype) + bias.reshape(shp).astype(x.dtype)
        return y * jax.nn.sigmoid(y) if swish else y

    rng = np.random.RandomState(0)

    def kern(k, ci, co):
        return jnp.asarray(rng.randn(k, k, ci, co) * 0.1, jnp.float32)

    def bnp(c):
        return (jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32))

    params = {
        "stem": kern(3, 3, 32), "stem_bn": bnp(32),
        # block0_0: dw k3 s1 C32 -> project 32->16
        "b00_dw": kern(3, 1, 32), "b00_dw_bn": bnp(32),
        "b00_pr": kern(1, 32, 16), "b00_pr_bn": bnp(16),
        # block1_0: expand 16->96, dw k3 s2, project 96->24
        "b10_ex": kern(1, 16, 96), "b10_ex_bn": bnp(96),
        "b10_dw": kern(3, 1, 96), "b10_dw_bn": bnp(96),
        "b10_pr": kern(1, 96, 24), "b10_pr_bn": bnp(24),
        # block1_1: expand 24->144, dw k3 s1, project 144->24, residual
        "b11_ex": kern(1, 24, 144), "b11_ex_bn": bnp(144),
        "b11_dw": kern(3, 1, 144), "b11_dw_bn": bnp(144),
        "b11_pr": kern(1, 144, 24), "b11_pr_bn": bnp(24),
    }

    def apply(p, x_nhwc):
        x = x_nhwc.astype(jnp.bfloat16)
        if fmt == "nchw":
            x = jnp.transpose(x, (0, 3, 1, 2))
        x = bn_swish(conv(x, p["stem"], stride=2), *p["stem_bn"])
        x = bn_swish(conv(x, p["b00_dw"], groups=32), *p["b00_dw_bn"])
        x = bn_swish(conv(x, p["b00_pr"]), *p["b00_pr_bn"], swish=False)
        x = bn_swish(conv(x, p["b10_ex"]), *p["b10_ex_bn"])
        x = bn_swish(conv(x, p["b10_dw"], stride=2, groups=96), *p["b10_dw_bn"])
        x = bn_swish(conv(x, p["b10_pr"]), *p["b10_pr_bn"], swish=False)
        r = x
        x = bn_swish(conv(x, p["b11_ex"]), *p["b11_ex_bn"])
        x = bn_swish(conv(x, p["b11_dw"], groups=144), *p["b11_dw_bn"])
        x = bn_swish(conv(x, p["b11_pr"]), *p["b11_pr_bn"], swish=False)
        x = x + r
        if fmt == "nchw":
            x = jnp.transpose(x, (0, 2, 3, 1))
        return x

    def loss(p, x):
        out = apply(p, x)
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    grad = jax.grad(loss)

    @functools.partial(jax.jit, static_argnames="reps")
    def step(p, x, reps=1):
        def body(p, _):
            g = grad(p, x)
            p = jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)
            return p, ()

        p, _ = lax.scan(body, p, None, length=reps)
        return p

    return params, step


def main():
    import jax

    plat = os.environ.get("PROBE_PLATFORM")
    if plat:  # env JAX_PLATFORMS is pinned by sitecustomize — use config
        jax.config.update("jax_platforms", plat)
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B = int(os.environ.get("PROBE_B", "64"))
    CHAIN = int(os.environ.get("PROBE_CHAIN", "10"))
    REPS = int(os.environ.get("PROBE_REPS", "9"))

    x = np.random.RandomState(1).rand(B, 224, 224, 3).astype(np.float32)
    x = jax.device_put(x)

    fns = {}
    for fmt in ("nhwc", "nchw"):
        p, step = build(fmt)
        p = jax.device_put(p)
        fns[fmt] = (p, step)
        t0 = time.perf_counter()
        sync(step(p, x, reps=CHAIN))
        print(f"# {fmt}: compiled in {time.perf_counter() - t0:.1f}s",
              flush=True)

    ts = {k: [] for k in fns}
    for _ in range(REPS):
        for k, (p, step) in fns.items():
            t0 = time.perf_counter()
            sync(step(p, x, reps=CHAIN))
            ts[k].append((time.perf_counter() - t0) / CHAIN)

    med = {k: float(np.median(v)) * 1e3 for k, v in ts.items()}
    print(json.dumps({
        "probe": "nchw_early", "batch": B, "chain": CHAIN, "reps": REPS,
        "ms_per_iter": med,
        "nchw_speedup": med["nhwc"] / med["nchw"],
    }))


if __name__ == "__main__":
    main()
