"""Depthwise convolution backends for TPU.

The reference's EfficientNet blocks (efficientnet-pytorch MBConv, reference:
model/efficientnet.py:28-89) spend most of their non-MXU time in depthwise
convolutions. XLA lowers ``conv_general_dilated(feature_group_count=C)`` on
TPU through the convolution emitter, which at batch 32 leaves the MXU idle
and the VPU underutilized for the small channel counts of B0 (16..192).

``depthwise_taps`` reformulates the k×k depthwise conv as the sum of k²
shifted elementwise multiplies: one fused VPU loop over the output, no
convolution lowering at all. It is algebraically identical (same kernel
parameter layout as ``nn.Conv(feature_group_count=C)``: [k, k, 1, C]) and
differentiates through standard slice/pad rules.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def depthwise_taps(x, w, stride: int, pads):
    """x [B, H, W, C], w [k, k, 1, C] → [B, H', W', C].

    ``pads`` is ((top, bottom), (left, right)) — TF-SAME asymmetric padding
    computed by the caller (models/efficientnet.py::_same_pads).
    """
    k = w.shape[0]
    x = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
    H, W = x.shape[1], x.shape[2]
    out = None
    for dy in range(k):
        for dx in range(k):
            sl = x[
                :,
                dy : H - k + 1 + dy : stride,
                dx : W - k + 1 + dx : stride,
                :,
            ]
            term = sl * w[dy, dx, 0]
            out = term if out is None else out + term
    return out


class DepthwiseTaps(nn.Module):
    """Drop-in for ``nn.Conv(features, (k,k), (s,s), feature_group_count=
    features)`` with an identical parameter pytree (param 'kernel' of shape
    [k, k, 1, features]), so torch-weight converters are backend-agnostic."""

    features: int
    kernel: int
    stride: int
    pads: tuple  # ((t, b), (l, r))
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, 1, self.features),
            jnp.float32,
        )
        return depthwise_taps(x.astype(self.dtype), w.astype(self.dtype),
                              self.stride, self.pads)


class DepthwisePallas(nn.Module):
    """Same parameter pytree as ``DepthwiseTaps``/``nn.Conv`` but with the
    Pallas flat-shift BACKWARD (ops/dw_pallas.py): the forward stays on
    XLA's near-roofline grouped-conv emitter; dx and dw run as dense-flat
    shift kernels reading each operand from HBM exactly once.  Falls back
    to the native VJP off-TPU-compile only when the flat-view geometry is
    unsupported (H·W·C not a multiple of lcm(C, 128))."""

    features: int
    kernel: int
    stride: int
    pads: tuple  # ((t, b), (l, r))
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        import jax

        from fedmlp_tpu.ops.dw_pallas import dw_conv_pallas, flat_supported

        k = self.kernel
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, 1, self.features),
            jnp.float32,
        )
        x = x.astype(self.dtype)
        w = w.astype(self.dtype)
        if not flat_supported(x.shape[1], x.shape[2], x.shape[3]):
            return depthwise_taps(x, w, self.stride, self.pads)
        interpret = jax.devices()[0].platform != "tpu"
        return dw_conv_pallas(x, w, self.stride, self.pads, interpret)


def depthwise_dense(x, w, stride: int, pads):
    """Depthwise conv as a FULL convolution with a diagonal-masked dense
    kernel: wd[i, j, cin, cout] = w[i, j, 0, cout] · δ(cin, cout).

    Same math as the grouped form (off-diagonal taps contribute exact
    zeros), but both the forward and — decisively — the BACKWARD lower
    through XLA:TPU's standard dense-convolution emitter. The round-3/4
    flagship profiles show the native grouped-conv VJP moving ~12x its
    operand bytes (bwd::block0_0/dw_conv: 7.2 GB where padded operands
    total ~0.6 GB, 42.6 ms/step); the dense backward is plain transposed
    convolution + kernel correlation, byte-clean and MXU-borne. The k²·C²
    extra MACs are noise next to the chip's idle MXU (8.6 of ~165 TFLOP/s
    achieved on this program) for the small-C blocks where the grouped
    pathology bites; larger-C blocks stay grouped (see
    models/efficientnet.py's dense-channel cap).
    """
    import jax

    k = w.shape[0]
    C = w.shape[-1]
    eye = jnp.eye(C, dtype=w.dtype)
    wd = w[:, :, 0, None, :] * eye[None, None]  # [k, k, C, C]
    return jax.lax.conv_general_dilated(
        x, wd.astype(x.dtype), (stride, stride), list(pads),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class DepthwiseDense(nn.Module):
    """Drop-in for the grouped ``nn.Conv`` with an identical parameter
    pytree (param 'kernel' [k, k, 1, features]) — see depthwise_dense."""

    features: int
    kernel: int
    stride: int
    pads: tuple  # ((t, b), (l, r))
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, 1, self.features),
            jnp.float32,
        )
        return depthwise_dense(x.astype(self.dtype), w.astype(self.dtype),
                               self.stride, self.pads)


class DepthwiseReroute(nn.Module):
    """Grouped-conv forward on XLA's fast emitter with the REROUTED
    backward of ops/dw_conv.py (custom_vjp): dx as a dilated depthwise
    conv of dy with the flipped kernel (the same forward emitter), dw as
    k² strided-shift multiply-reduce taps. Pure-XLA ops throughout — the
    round-3 Pallas backward swaps closed negative, but this reroute was
    never integrated end-to-end (round-4 A/B). Same parameter pytree as
    the other backends."""

    features: int
    kernel: int
    stride: int
    pads: tuple  # ((t, b), (l, r))
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from fedmlp_tpu.ops.dw_conv import dw_conv

        k = self.kernel
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, 1, self.features),
            jnp.float32,
        )
        return dw_conv(x.astype(self.dtype), w.astype(self.dtype),
                       self.stride, tuple(map(tuple, self.pads)))
