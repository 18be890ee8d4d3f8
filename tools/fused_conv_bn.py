"""Prototype: fused 1×1-conv + BatchNorm-statistics Pallas kernel.

Round-2 profiling (BENCH_NOTES.md) pinned the bench round at the HBM
roofline with convolution fusions at 4.0 GB/step vs ~2.5 GB if BN and the
activation rode inside the conv kernels. This module de-risks that
round-3 roadmap item with the smallest useful slice: a pointwise conv
whose epilogue accumulates the per-channel sum and sum-of-squares while
the output tile is still in registers — the activation is read/written
exactly once, where the XLA pair (conv fusion + convert_reduce stats
fusion) re-reads the conv output for the statistics.

Forward-only by design: the measurement target is byte traffic, and the
backward story (dy→dx/dw with the BN backward folded in) reuses the same
structure. Not wired into the models; see tools/probe_fused_conv_bn.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, y_ref, sum_ref, ssq_ref, *, n_tiles):
    """Grid over M tiles of x [Mt, Ci]; w [Ci, Co]; y [Mt, Co];
    sum/ssq [1, Co] accumulated across the grid (same output block for
    every program — TPU grids run sequentially on one core)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        ssq_ref[:] = jnp.zeros_like(ssq_ref)

    y = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)
    sum_ref[:] += jnp.sum(y, axis=0, keepdims=True)
    ssq_ref[:] += jnp.sum(y * y, axis=0, keepdims=True)


def _stats_kernel(x_ref, w_ref, sum_ref, ssq_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        ssq_ref[:] = jnp.zeros_like(ssq_ref)

    y = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    sum_ref[:] += jnp.sum(y, axis=0, keepdims=True)
    ssq_ref[:] += jnp.sum(y * y, axis=0, keepdims=True)


def _norm_kernel(x_ref, w_ref, mul_ref, add_ref, out_ref, *, act):
    """out = act((x@w) * mul + add) — mul/add fold mean/var/scale/bias."""
    y = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    z = y * mul_ref[:] + add_ref[:]
    if act == "swish":
        z = z * jax.nn.sigmoid(z)
    out_ref[:] = z.astype(out_ref.dtype)


def conv1x1_bn_act_2pass(x2d, w, scale, bias, eps: float = 1e-3,
                         act: str = "swish", tile_m: int | None = None,
                         interpret: bool | None = None):
    """Two-pass fused pointwise-conv + BatchNorm + activation: pass 1
    computes the batch statistics from in-register matmul tiles, pass 2
    recomputes the matmul and writes ONLY the normalized activation — the
    raw conv output never touches HBM (the XLA chain writes it, re-reads
    it for stats, re-reads it for the normalize). Trades 2× matmul FLOPs
    (idle MXU) for ~3× less activation traffic.

    Returns (out [M,Co] in x2d.dtype, mean [Co] f32, var [Co] f32)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    M, Ci = x2d.shape
    Co = w.shape[1]
    if tile_m is None:
        tile_m = 8
        for t in range(1024, 7, -8):
            if M % t == 0:
                tile_m = t
                break
    assert M % tile_m == 0, (M, tile_m)
    n_tiles = M // tile_m
    vm = pl.ANY if interpret else pltpu.VMEM
    s, ss = pl.pallas_call(
        _stats_kernel,
        grid=(n_tiles,),
        out_shape=(jax.ShapeDtypeStruct((1, Co), jnp.float32),
                   jax.ShapeDtypeStruct((1, Co), jnp.float32)),
        in_specs=[pl.BlockSpec((tile_m, Ci), lambda i: (i, 0),
                               memory_space=vm),
                  pl.BlockSpec((Ci, Co), lambda i: (0, 0),
                               memory_space=vm)],
        out_specs=(pl.BlockSpec((1, Co), lambda i: (0, 0), memory_space=vm),
                   pl.BlockSpec((1, Co), lambda i: (0, 0), memory_space=vm)),
        interpret=interpret,
    )(x2d, w)
    mean = s[0] / M
    var = jnp.maximum(ss[0] / M - mean * mean, 0.0)
    rsig = jax.lax.rsqrt(var + eps)
    mul = (rsig * scale.astype(jnp.float32)).reshape(1, Co)
    add = (bias.astype(jnp.float32) - mean * rsig
           * scale.astype(jnp.float32)).reshape(1, Co)
    out = pl.pallas_call(
        functools.partial(_norm_kernel, act=act),
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((M, Co), x2d.dtype),
        in_specs=[pl.BlockSpec((tile_m, Ci), lambda i: (i, 0),
                               memory_space=vm),
                  pl.BlockSpec((Ci, Co), lambda i: (0, 0), memory_space=vm),
                  pl.BlockSpec((1, Co), lambda i: (0, 0), memory_space=vm),
                  pl.BlockSpec((1, Co), lambda i: (0, 0), memory_space=vm)],
        out_specs=pl.BlockSpec((tile_m, Co), lambda i: (i, 0),
                               memory_space=vm),
        interpret=interpret,
    )(x2d, w, mul, add)
    return out, mean, var


def conv1x1_bn_stats(x2d, w, tile_m: int | None = None,
                     interpret: bool | None = None):
    """x2d [M, Ci] · w [Ci, Co] → (y [M, Co] in x2d.dtype,
    channel_sum [Co] f32, channel_sumsq [Co] f32).

    tile_m defaults to the largest divisor of M that is ≤ 1024 and a
    multiple of 8 (sublane-aligned); pass explicitly to override."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    M, Ci = x2d.shape
    Co = w.shape[1]
    if tile_m is None:
        tile_m = 8
        for t in range(1024, 7, -8):
            if M % t == 0:
                tile_m = t
                break
    assert M % tile_m == 0, (M, tile_m)
    n_tiles = M // tile_m
    kernel = functools.partial(_kernel, n_tiles=n_tiles)
    y, s, ss = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=(
            jax.ShapeDtypeStruct((M, Co), x2d.dtype),
            jax.ShapeDtypeStruct((1, Co), jnp.float32),
            jax.ShapeDtypeStruct((1, Co), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((tile_m, Ci), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((Ci, Co), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_m, Co), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ),
        interpret=interpret,
    )(x2d, w)
    return y, s[0], ss[0]
