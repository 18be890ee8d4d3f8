"""Depthwise convolution with a rerouted backward pass for TPU.

The reference's EfficientNet blocks (efficientnet-pytorch MBConv,
reference: model/efficientnet.py:28-89) are depthwise-separable; on TPU
the flagship round profile (BENCH_NOTES.md round-3 tables) shows XLA's
NATIVE VJP of ``conv_general_dilated(feature_group_count=C)`` running at
169-450 GB/s with ~2.3x ideal bytes — 144 ms of the 536 ms stage-1 step —
while the forward dw conv emitter is near ideal bytes. The pathology is
the backward lowering (weight-gradient as a spatial-contraction
convolution over padded channel tiles).

``dw_conv`` keeps the forward exactly as XLA's fast path (custom_vjp
traces the primal inline, so BN/activation epilogue fusion is
unaffected) and reroutes the backward:

* dx — a plain depthwise conv of dy with the spatially flipped kernel
  (lhs_dilation=stride for strided blocks), i.e. the same fast forward
  emitter;
* dw — k^2 strided-shift multiply+reduce taps, which XLA fuses into a
  few wide reduction passes over x and dy instead of the pathological
  conv-as-contraction form.

Numerical equivalence vs the native VJP is asserted in
tests/test_depthwise.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dw(x, w, stride: int, pads):
    """Forward depthwise conv, NHWC, kernel [k, k, 1, C] (nn.Conv layout
    with feature_group_count=C)."""
    C = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=list(pads),
        feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def dw_conv_xla(x, w, stride: int, pads):
    """Native-VJP depthwise conv (XLA differentiates it)."""
    return _dw(x, w, stride, pads)


def _dx_via_fwd(dy, w, stride: int, pads, C):
    """dx = depthwise conv of (dilated) dy with the flipped kernel —
    routed through the same forward conv emitter."""
    k = w.shape[0]
    (pt, pb), (pl, pr) = pads
    wf = w[::-1, ::-1]
    return jax.lax.conv_general_dilated(
        dy, wf.astype(dy.dtype),
        window_strides=(1, 1),
        padding=[(k - 1 - pt, k - 1 - pb), (k - 1 - pl, k - 1 - pr)],
        lhs_dilation=(stride, stride),
        feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _dw_grad_taps(x, dy, k: int, stride: int, pads):
    """dw[ky, kx, 0, c] = sum_{b,y,x} x_pad[b, s*y+ky, s*x+kx, c] *
    dy[b, y, x, c] — one shifted strided slice + multiply + full reduce
    per tap; XLA fuses the k^2 taps into a handful of wide passes."""
    (pt, pb), (pl, pr) = pads
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    O_h, O_w = dy.shape[1], dy.shape[2]
    dyf = dy.astype(jnp.float32)
    rows = []
    for ky in range(k):
        cols = []
        for kx in range(k):
            xs = jax.lax.slice(
                xp,
                (0, ky, kx, 0),
                (xp.shape[0], ky + stride * (O_h - 1) + 1,
                 kx + stride * (O_w - 1) + 1, xp.shape[3]),
                (1, stride, stride, 1),
            )
            cols.append(jnp.sum(xs.astype(jnp.float32) * dyf, axis=(0, 1, 2)))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)[:, :, None, :]  # [k, k, 1, C]


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dw_conv(x, w, stride: int, pads):
    return _dw(x, w, stride, pads)


def _fwd(x, w, stride, pads):
    return _dw(x, w, stride, pads), (x, w)


def _bwd(stride, pads, res, dy):
    x, w = res
    C = x.shape[-1]
    k = w.shape[0]
    dx = _dx_via_fwd(dy, w, stride, pads, C)
    dw = _dw_grad_taps(x, dy, k, stride, pads).astype(w.dtype)
    return dx.astype(x.dtype), dw


dw_conv.defvjp(_fwd, _bwd)
