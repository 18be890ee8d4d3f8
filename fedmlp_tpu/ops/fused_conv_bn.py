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
