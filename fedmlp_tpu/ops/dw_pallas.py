"""Pallas depthwise-conv kernels for the MBConv backward hot path.

The flagship round profile (BENCH_NOTES.md round-3 tables) shows the
BACKWARD of XLA's depthwise convolutions — ~112 ms of the 536 ms stage-1
step — running at 162-450 GB/s with up to 2.3x ideal bytes (worst op:
bwd block0_0/dw_conv 44.5 ms at 162 GB/s for 7.2 GB).  The forward
emitter is near ideal bytes, so these kernels replace only the VJP:
dx via the stride-1 conv kernel on the (dilated) cotangent with the
spatially flipped filter, and dw via k² masked shift-multiply-reduce
passes with x and dy read from HBM exactly once.

Layout (the warp-v3 lesson: whole-buffer STATIC ops only, and the VMEM
lesson from the first prototype: an (H·W, C) buffer pads C to 128 lanes
— 4x physical VMEM at block0's C=32).  Each image is viewed as its flat
NHWC vector reshaped to (S, M) with M = lcm(C, 128) lanes: every buffer
is lane-dense for all of B0's channel counts.  A conv tap (ky, kx)
shifts the flat vector by Delta = ((ky-pt)·W + (kx-pl))·C, which on the
(S, M) view decomposes into one static lane roll by r = Delta mod M and
a two-row static-slice select (row carry where lane >= M - r):

    shifted[a, m] = v[a + s + (m >= M - r), (m + r) mod M]

Because Delta is a multiple of C, channels stay aligned and the filter
becomes a single (M,) row (w tiled M/C times).  Row-edge wrap terms are
zeroed by a mask on the OUTPUT column ((flat // C) mod W), which depends
only on kx; vertical out-of-range taps fall outside [0, N) in flat index
space once the horizontal mask is applied, and are zeroed by the row
shift's edge padding.

Strided blocks (stride 2) route through the same stride-1 kernels by
zero-embedding dy at input resolution (interior+high lax.pad — H must be
even, true for every B0 stage).  Reference semantics:
nn.Conv(feature_group_count=C) with TF-SAME asymmetric padding
(models/efficientnet.py::_same_pads); equivalence vs the XLA lowering at
Precision.HIGHEST is asserted in tests/test_depthwise.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _geom(H: int, W: int, C: int):
    """Dense-flat view geometry: (S, M) with M = lcm(C, 128)."""
    g = math.gcd(C, 128)
    M = (C // g) * 128          # lcm(C, 128) == Q * C
    Q = 128 // g
    N = H * W * C
    if N % M != 0:
        return None
    return N // M, M, Q


def flat_supported(H: int, W: int, C: int) -> bool:
    return _geom(H, W, C) is not None


def _shifted(v, delta: int, S: int, M: int):
    """shifted[a, m] = v[flat a·M + m + delta], zero outside [0, S·M)."""
    s, r = delta // M, delta % M
    u = v if r == 0 else pltpu.roll(v, shift=(M - r) % M, axis=1)

    def rowshift(t, sh):
        if sh == 0:
            return t
        if sh >= S or sh <= -S:
            return jnp.zeros_like(t)
        if sh > 0:
            return jnp.pad(t[sh:], ((0, sh), (0, 0)))
        return jnp.pad(t[:S + sh], ((-sh, 0), (0, 0)))

    if r == 0:
        return rowshift(u, s)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, M), 1)
    return jnp.where(lane < M - r, rowshift(u, s), rowshift(u, s + 1))


def _xcol(S: int, M: int, C: int, W: int):
    """Output column index (in [0, W)) of every position of the (S, M)
    flat view."""
    row = jax.lax.broadcasted_iota(jnp.int32, (S, M), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, M), 1)
    return ((row * M + lane) // C) % W


def _conv_kernel(x_ref, w_ref, o_ref, *, H, W, C, k, pt, pl_pad, S, M):
    x = x_ref[0].astype(jnp.float32)
    xcol = _xcol(S, M, C, W)
    acc = jnp.zeros((S, M), jnp.float32)
    for ky in range(k):
        for kx in range(k):
            delta = ((ky - pt) * W + (kx - pl_pad)) * C
            sh = _shifted(x, delta, S, M)
            # input column xcol + kx - pl_pad must lie in [0, W)
            ok = (xcol + (kx - pl_pad) >= 0) & (xcol + (kx - pl_pad) < W)
            w_row = w_ref[ky * k + kx].astype(jnp.float32)  # [M]
            acc = acc + jnp.where(ok, sh, 0.0) * w_row[None, :]
    o_ref[0] = acc.astype(o_ref.dtype)


def _wgrad_kernel(x_ref, dy_ref, o_ref, *, H, W, C, k, pt, pl_pad, S, M, Q):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    xcol = _xcol(S, M, C, W)
    taps = []
    for ky in range(k):
        for kx in range(k):
            delta = ((ky - pt) * W + (kx - pl_pad)) * C
            sh = _shifted(x, delta, S, M)
            ok = (xcol + (kx - pl_pad) >= 0) & (xcol + (kx - pl_pad) < W)
            prod = jnp.where(ok, sh, 0.0) * dy
            col = jnp.sum(prod, axis=0, keepdims=True)         # [1, M]
            # fold the Q channel repeats of the lcm row by static lane
            # slices (a lane-dim reshape (M,) -> (Q, C) does not lower)
            tap = col[:, 0:C]
            for q in range(1, Q):
                tap = tap + col[:, q * C:(q + 1) * C]
            taps.append(tap[0])                                 # [C]
    o_ref[...] += jnp.stack(taps)                      # [k*k, C]


def dw_conv_flat_s1(x, w, pads, interpret: bool = False):
    """Stride-1 depthwise conv, NHWC, filter [k, k, 1, C], per-axis pads
    summing to k-1 (any split) so out spatial == in spatial."""
    B, H, W, C = x.shape
    k = w.shape[0]
    (pt, pb), (pl_pad, pr) = pads
    assert pt + pb == k - 1 and pl_pad + pr == k - 1, (pads, k)
    geom = _geom(H, W, C)
    assert geom is not None, (H, W, C)
    S, M, Q = geom
    wf = jnp.tile(w.reshape(k * k, C), (1, Q)).astype(jnp.float32)  # [k², M]
    kern = functools.partial(_conv_kernel, H=H, W=W, C=C, k=k, pt=pt,
                             pl_pad=pl_pad, S=S, M=M)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, M), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * k, M), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, M), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, M), x.dtype),
        interpret=interpret,
    )(x.reshape(B, S, M), wf)
    return out.reshape(B, H, W, C)


def dw_wgrad_flat_s1(x, dy, k: int, pads, interpret: bool = False):
    """Weight gradient of the stride-1 depthwise conv: [k, k, 1, C] f32.
    x and dy are both (B, H, W, C) (dy possibly a zero-dilated embed of a
    strided cotangent)."""
    B, H, W, C = x.shape
    (pt, _pb), (pl_pad, _pr) = pads
    geom = _geom(H, W, C)
    assert geom is not None, (H, W, C)
    S, M, Q = geom
    kern = functools.partial(_wgrad_kernel, H=H, W=W, C=C, k=k, pt=pt,
                             pl_pad=pl_pad, S=S, M=M, Q=Q)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, M), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, M), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * k, C), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * k, C), jnp.float32),
        interpret=interpret,
    )(x.reshape(B, S, M), dy.reshape(B, S, M))
    return out.reshape(k, k, 1, C)


def _dilate_to_input(dy, stride: int, H: int, W: int):
    """Zero-embed a strided cotangent (B, Ho, Wo, C) at input resolution
    (B, H, W, C): data at rows/cols stride·i, zeros elsewhere."""
    if stride == 1:
        return dy
    B, Ho, Wo, C = dy.shape
    hi_h = H - ((Ho - 1) * stride + 1)
    hi_w = W - ((Wo - 1) * stride + 1)
    assert hi_h >= 0 and hi_w >= 0, (dy.shape, stride, H, W)
    return jax.lax.pad(
        dy, jnp.zeros((), dy.dtype),
        [(0, 0, 0), (0, hi_h, stride - 1), (0, hi_w, stride - 1), (0, 0, 0)],
    )


def _dw_fwd_xla(x, w, stride: int, pads):
    C = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=list(pads), feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def dw_conv_pallas(x, w, stride: int, pads, interpret: bool = False):
    """Depthwise conv with XLA's (near-roofline) forward emitter and the
    Pallas flat-shift backward: dx = stride-1 conv of the dilated
    cotangent with the flipped filter, dw = the wgrad kernel."""
    return _dw_fwd_xla(x, w, stride, pads)


def _vjp_fwd(x, w, stride, pads, interpret):
    return _dw_fwd_xla(x, w, stride, pads), (x, w)


def _vjp_bwd(stride, pads, interpret, res, dy):
    x, w = res
    B, H, W, C = x.shape
    k = w.shape[0]
    (pt, pb), (pl_pad, pr) = pads
    dy_e = _dilate_to_input(dy, stride, H, W)
    # dx: correlate the embedded cotangent with the flipped filter; the
    # tap alignment works out to pads (k-1-pt, pt), (k-1-pl, pl).
    wf = w[::-1, ::-1]
    dx = dw_conv_flat_s1(
        dy_e, wf, ((k - 1 - pt, pt), (k - 1 - pl_pad, pl_pad)),
        interpret=interpret,
    )
    dw = dw_wgrad_flat_s1(x, dy_e, k, pads, interpret=interpret)
    return dx.astype(x.dtype), dw.astype(w.dtype)


dw_conv_pallas.defvjp(_vjp_fwd, _vjp_bwd)
