"""Pallas depthwise-conv kernels for the MBConv backward hot path.

The flagship round profile (BENCH_NOTES.md round-3 tables) shows the
BACKWARD of XLA's depthwise convolutions — ~112 ms of the 536 ms stage-1
step — running at 162-450 GB/s with up to 2.3x ideal bytes (worst op:
bwd block0_0/dw_conv 44.5 ms at 162 GB/s for 7.2 GB).  The forward
emitter is near ideal bytes, so these kernels replace only the VJP:
dx via the stride-1 conv kernel on the (dilated) cotangent with the
spatially flipped filter, and dw via k² window-multiply-reduce passes
with x and dy read from HBM exactly once.

Formulation (padded-window; a first roll+select flat-shift variant
measured 2x SLOWER than XLA's native VJP — ~6 whole-buffer VPU ops per
tap; this one needs ~2): an image lives in VMEM as an (H, W·C) buffer
(image row = buffer row, channels minor within lanes).  The kernel
zero-initializes an (H+k-1, (W+k-1)·C) scratch and writes the image at
row offset pt, lane offset pl·C — after which EVERY conv tap is one
fully-in-bounds static rectangular window read + FMA:

    acc[0:H, 0:W·C] += x_pad[ky : ky+H, kx·C : kx·C + W·C] * w_row[ky,kx]

with w_row the filter tap broadcast W times along lanes (precomputed
outside, k² × W·C).  No rolls, no masks, no edge selects.  The weight
gradient reduces the same windows against the cotangent: row-sum then a
halving tree over the W lane-groups down to C lanes.

Strided blocks (stride 2) route through the same stride-1 kernels by
zero-embedding dy at input resolution (interior+high lax.pad — H must be
even, true for every B0 stage).  Reference semantics:
nn.Conv(feature_group_count=C) with TF-SAME asymmetric padding
(models/efficientnet.py::_same_pads); equivalence vs the XLA lowering at
Precision.HIGHEST is asserted in tests/test_depthwise.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# v5e cores have 128 MiB of VMEM; the default 16 MiB scoped limit is too
# small for whole-image buffers at 224 px.  Leave headroom for the
# pipeline's double buffering.
_VMEM_LIMIT = 96 * 1024 * 1024


def flat_supported(H: int, W: int, C: int) -> bool:
    """The padded-window kernels have no divisibility constraints; keep
    the gate for pathological tiny shapes only."""
    return H >= 1 and W >= 1 and C >= 1


def _fold_w(t, W: int, C: int):
    """Sum the W lane-groups of a (rows, W·C) buffer down to (rows, C) by
    a static halving tree (a lane-dim reshape (W·C,) -> (W, C) does not
    lower in Mosaic)."""
    while W > 1:
        h = W // 2
        s = t[:, : h * C] + t[:, h * C : 2 * h * C]
        if W % 2:
            tail = t[:, 2 * h * C : W * C]
            head = s[:, :C] + tail
            s = head if h == 1 else jnp.concatenate(
                [head, s[:, C:]], axis=1)
        t, W = s, h
    return t


def _conv_kernel(x_ref, w_ref, o_ref, xp_ref, acc_ref, *, H, W, C, k, pt,
                 pl_pad):
    Wp = (W + k - 1) * C
    xp_ref[...] = jnp.zeros_like(xp_ref)
    xp_ref[pt : pt + H, pl_pad * C : pl_pad * C + W * C] = x_ref[0]
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for ky in range(k):
        for kx in range(k):
            win = xp_ref[ky : ky + H, kx * C : kx * C + W * C]
            w_row = w_ref[ky * k + kx]  # [W·C]
            acc_ref[...] += win.astype(jnp.float32) * w_row[None, :]
    o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _wgrad_kernel(x_ref, dy_ref, o_ref, xp_ref, *, H, W, C, k, pt,
                  pl_pad):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    xp_ref[...] = jnp.zeros_like(xp_ref)
    xp_ref[pt : pt + H, pl_pad * C : pl_pad * C + W * C] = x_ref[0]
    dy = dy_ref[0].astype(jnp.float32)
    taps = []
    for ky in range(k):
        for kx in range(k):
            win = xp_ref[ky : ky + H, kx * C : kx * C + W * C]
            prod = win.astype(jnp.float32) * dy
            col = jnp.sum(prod, axis=0, keepdims=True)  # [1, W·C]
            taps.append(_fold_w(col, W, C)[0])          # [C]
    o_ref[...] += jnp.stack(taps)                        # [k², C]


def _tap_rows(w, k: int, C: int, W: int):
    """Precompute the per-tap lane rows: w [k,k,1,C] -> [k², W·C] f32."""
    return jnp.tile(w.reshape(k * k, C).astype(jnp.float32), (1, W))


def dw_conv_flat_s1(x, w, pads, interpret: bool = False):
    """Stride-1 depthwise conv, NHWC, filter [k, k, 1, C], per-axis pads
    summing to k-1 (any split) so out spatial == in spatial."""
    B, H, W, C = x.shape
    k = w.shape[0]
    (pt, pb), (pl_pad, pr) = pads
    assert pt + pb == k - 1 and pl_pad + pr == k - 1, (pads, k)
    kern = functools.partial(_conv_kernel, H=H, W=W, C=C, k=k, pt=pt,
                             pl_pad=pl_pad)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W * C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * k, W * C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W * C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W * C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((H + k - 1, (W + k - 1) * C), x.dtype),
            pltpu.VMEM((H, W * C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x.reshape(B, H, W * C), _tap_rows(w, k, C, W))
    return out.reshape(B, H, W, C)


def dw_wgrad_flat_s1(x, dy, k: int, pads, interpret: bool = False):
    """Weight gradient of the stride-1 depthwise conv: [k, k, 1, C] f32.
    x and dy are both (B, H, W, C) (dy possibly a zero-dilated embed of a
    strided cotangent)."""
    B, H, W, C = x.shape
    (pt, _pb), (pl_pad, _pr) = pads
    kern = functools.partial(_wgrad_kernel, H=H, W=W, C=C, k=k, pt=pt,
                             pl_pad=pl_pad)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W * C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W * C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * k, C), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * k, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H + k - 1, (W + k - 1) * C), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x.reshape(B, H, W * C), dy.reshape(B, H, W * C))
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
    Pallas padded-window backward: dx = stride-1 conv of the dilated
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
