"""Paeth three-shear affine warp — the TPU-native random-affine kernel.

The straightforward bilinear warp (ops/augment.py::affine_warp) samples at
arbitrary 2D coordinates, which XLA lowers to per-element gathers; measured
on TPU that costs ~1.8 ms/image — 5x the cost of an EfficientNet-B0
training step. This module replaces it on the hot path with the classic
Paeth/Catmull-Smith decomposition: a rotation + translation factors into
three axis-aligned shears,

    src_x = cosθ·x − sinθ·y + C        (torchvision RandomAffine inverse
    src_y = sinθ·x + cosθ·y + F         map about the image center)

    pass 1: horizontal shear   s1(y) = α(y−cy) + τ,   α = −tan(θ/2)
    pass 2: vertical shear     s2(x) = β(x−cx) + t2,  β = sinθ
    pass 3: horizontal shear   s3(y) = α(y−cy) + τ

and each shear is a per-row 1-D fractional shift — two dynamic slices and
a lerp, no gathers. The Pallas kernel streams row blocks through VMEM; the
vertical pass reuses it under a transpose. Zero padding reproduces the
black border fill of PIL/torchvision affine ops.

A jnp fallback with identical arithmetic (take_along_axis) runs on CPU so
tests validate the kernel bit-for-bit in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 64  # max |shift| supported; 10° rotation + 2% translate needs < 32
_ROWS_PER_BLOCK = 8


def paeth_shift_vectors(theta, tx, ty, H: int, W: int):
    """Shift vectors (s1 [H], s2 [W], s3 [H]) whose three-pass composition
    equals the single-pass inverse affine map used by ops/augment.py
    (rotation θ about center, translation (tx, ty))."""
    cx = (W - 1) / 2.0
    cy = (H - 1) / 2.0
    sin, cos = jnp.sin(theta), jnp.cos(theta)
    alpha = -jnp.tan(theta / 2.0)
    beta = sin
    # single-pass constants (ops/augment.py::_center_affine semantics)
    C = cx - cos * cx + sin * cy + (cos * -tx + (-sin) * -ty)
    F = cy - sin * cx - cos * cy + (sin * -tx + cos * -ty)
    tau = (C - alpha * F) / 2.0 + alpha * cy
    t2 = F + alpha * beta * cy + beta * cx - beta * tau

    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    s1 = alpha * (ys - cy) + tau
    s2 = beta * (xs - cx) + t2
    s3 = alpha * (ys - cy) + tau
    return s1, s2, s3


# ----------------------------------------------------------------------
# Per-row fractional horizontal shift: out[r, x] = in[r, x + s_r]
# ----------------------------------------------------------------------

def _hshift_kernel(shifts_ref, in_ref, out_ref, *, width):
    """Mosaic forbids dynamic lane-dim slices at arbitrary offsets; the
    fractional shift is therefore a dynamic LANE ROTATE (pltpu.roll, which
    Mosaic supports with a traced shift) followed by a 128-aligned static
    slice. The input is zero-padded with a 128-lane left margin, so the
    rotate never wraps live pixels into the output window."""
    rb = out_ref.shape[1]
    row0 = pl.program_id(0) * rb
    for r in range(rb):  # static unroll over the row block
        s = shifts_ref[0, row0 + r]
        k = jnp.floor(s).astype(jnp.int32)
        w = s - k.astype(jnp.float32)
        row = in_ref[:, r, :]  # [C, Wp]
        lo = pltpu.roll(row, -k, axis=1)[:, 128 : 128 + width]
        hi = pltpu.roll(row, -(k + 1), axis=1)[:, 128 : 128 + width]
        out_ref[:, r, :] = (1.0 - w) * lo + w * hi


def hshift_rows_pallas(planar, shifts, interpret: bool | None = None):
    """planar [C, H, W] f32, shifts [H] → shifted [C, H, W] with zero fill.

    Positive shift s means sampling source at x + s. |s| must stay below
    ~96 (left margin 128 minus roll slack); the weak-augment shears are
    bounded by ~32."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    C, H, W = planar.shape
    # lane dim must be a multiple of 128; left margin exactly 128 so the
    # kernel's static slice offset is aligned
    Wp = ((W + 192 + 127) // 128) * 128
    padded = jnp.pad(planar, ((0, 0), (0, 0), (128, Wp - 128 - W)))
    rb = _ROWS_PER_BLOCK
    Hb = (H + rb - 1) // rb
    if H % rb:
        padded = jnp.pad(padded, ((0, 0), (0, Hb * rb - H), (0, 0)))
        shifts = jnp.pad(shifts, (0, Hb * rb - H))
    kernel = functools.partial(_hshift_kernel, width=W)
    out = pl.pallas_call(
        kernel,
        grid=(Hb,),
        out_shape=jax.ShapeDtypeStruct((C, Hb * rb, W), jnp.float32),
        in_specs=[
            # whole shift vector resident in SMEM; rows picked by program id
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((C, rb, Wp), lambda i: (0, i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, rb, W), lambda i: (0, i, 0),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(shifts.reshape(1, -1).astype(jnp.float32), padded)
    return out[:, :H]


def hshift_rows_jnp(planar, shifts):
    """Reference implementation — identical arithmetic via take_along_axis."""
    C, H, W = planar.shape
    padded = jnp.pad(planar, ((0, 0), (0, 0), (PAD, PAD)))
    k = jnp.floor(shifts).astype(jnp.int32)
    w = (shifts - k)[None, :, None]
    xs = jnp.arange(W)[None, :]
    base = jnp.clip(PAD + k[:, None] + xs, 0, W + 2 * PAD - 2)  # [H, W]
    idx = jnp.broadcast_to(base[None], (C, H, W))
    lo = jnp.take_along_axis(padded, idx, axis=2)
    hi = jnp.take_along_axis(padded, idx + 1, axis=2)
    return (1.0 - w) * lo + w * hi


def paeth_affine(planar, theta, tx, ty, use_pallas: bool | None = None):
    """Warp one planar image [C, H, W] f32 by the inverse affine map
    (rotation θ + translation) via three shear passes."""
    C, H, W = planar.shape
    s1, s2, s3 = paeth_shift_vectors(theta, tx, ty, H, W)
    shift = hshift_rows_pallas if _use_pallas(use_pallas) else hshift_rows_jnp
    x = shift(planar, s1)
    x = jnp.swapaxes(x, 1, 2)  # [C, W, H]
    x = shift(x, s2)
    x = jnp.swapaxes(x, 1, 2)
    x = shift(x, s3)
    return x


def _use_pallas(flag):
    if flag is not None:
        return flag
    return jax.devices()[0].platform == "tpu"


# ----------------------------------------------------------------------
# Weak-augmentation pipeline on the Paeth path
# ----------------------------------------------------------------------

def weak_augment_batch_paeth(images_u8, key, mean, std, degrees=10.0,
                             translate=0.02, use_pallas: bool | None = None):
    """Drop-in replacement for ops.augment.weak_augment_batch: RandomAffine
    (10°, 2% translate) + RandomHorizontalFlip + Normalize, with the warp
    running as shear passes instead of gathers. Identical parameter
    distributions (same jax.random consumption order per image)."""
    B, H, W, _ = images_u8.shape
    keys = jax.random.split(key, 2 * B).reshape(B, 2, 2)

    def one(img, ks):
        k1, k2 = ks[0], ks[1]
        ka, kb, kc = jax.random.split(k1, 3)
        ang = jax.random.uniform(ka, (), minval=-degrees, maxval=degrees)
        tx = jax.random.uniform(kb, (), minval=-translate, maxval=translate) * W
        ty = jax.random.uniform(kc, (), minval=-translate, maxval=translate) * H
        planar = img.astype(jnp.float32).transpose(2, 0, 1)
        warped = paeth_affine(planar, jnp.deg2rad(ang), tx, ty, use_pallas)
        flip = jax.random.bernoulli(k2, 0.5)
        warped = jnp.where(flip, warped[:, :, ::-1], warped)
        out = warped.transpose(1, 2, 0)
        m = jnp.asarray(mean, jnp.float32) * 255.0
        s = jnp.asarray(std, jnp.float32) * 255.0
        return (out - m) / s

    return jax.vmap(one)(images_u8, keys)
