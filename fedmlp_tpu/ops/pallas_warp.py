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


def paeth_shift_params(theta, tx, ty, H: int, W: int):
    """The same three shears as ``paeth_shift_vectors`` in closed
    (slope, offset, center) form — shift_row(y) = slope·(y−center)+offset —
    for the fused kernel, which reconstructs per-row shifts in-register."""
    cx = (W - 1) / 2.0
    cy = (H - 1) / 2.0
    sin, cos = jnp.sin(theta), jnp.cos(theta)
    alpha = -jnp.tan(theta / 2.0)
    beta = sin
    C = cx - cos * cx + sin * cy + (cos * -tx + (-sin) * -ty)
    F = cy - sin * cx - cos * cy + (sin * -tx + cos * -ty)
    tau = (C - alpha * F) / 2.0 + alpha * cy
    t2 = F + alpha * beta * cy + beta * cx - beta * tau
    return jnp.stack([
        jnp.stack([alpha, tau, jnp.float32(cy)]),
        jnp.stack([beta, t2, jnp.float32(cx)]),
        jnp.stack([alpha, tau, jnp.float32(cy)]),
    ])


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
    Wp = in_ref.shape[2]
    row0 = pl.program_id(0) * rb
    for r in range(rb):  # static unroll over the row block
        s = shifts_ref[0, row0 + r]
        k = jnp.floor(s).astype(jnp.int32)
        w = s - k.astype(jnp.float32)
        row = in_ref[:, r, :]  # [C, Wp]
        # compiled Mosaic mis-lowers NEGATIVE traced roll amounts (verified
        # on-device: positive k → wrong output, negative k → correct);
        # keep the cyclic shift non-negative via mod
        sh = jnp.mod(-k, Wp)
        lo = pltpu.roll(row, sh, axis=1)[:, 128 : 128 + width]
        hi = pltpu.roll(row, jnp.mod(sh - 1, Wp), axis=1)[:, 128 : 128 + width]
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

# ----------------------------------------------------------------------
# v3: fully fused warp — all three shear passes + normalize in ONE kernel,
# image resident in VMEM throughout (read u8 once, write normalized f32
# once), with BLOCK-parallel shears. The round profile showed the v1/v2
# row-serial formulation at 60 GB/s: a 224px image issues ~1,300 dynamic
# lane-rotates on [3, 1, 512] operands (2 per row), each using 3 of 8
# sublanes. Here each 8-row block does ONE dynamic rotate by the block's
# common integer shift K_b; the per-row residual (bounded by
# slope·7 < 2 px for the ≤10° weak-augment shears) is resolved by SIX
# STATIC-slice taps combined with per-row one-hot lerp weights — full
# 8-sublane VPU ops, 16x fewer dynamic rotates, bit-identical arithmetic
# to the per-row lerp (the extra taps contribute exact 0.0 terms).
# The horizontal flip is pre-composed into the affine parameters
# (flip∘affine(θ,tx,ty) ≡ affine(−θ,−tx,ty)∘flip, flip applied to the
# cheap u8 input), so the kernel itself is flip-free.
# ----------------------------------------------------------------------

_RB = 8  # rows per shear block (f32 sublane tile)
# v5 experiment knob: rows per shear block. The round-4 profile showed the
# kernel VMEM-LATENCY-bound (not FMA-bound: the v4 tap shrink measured
# 1.0007 neutral); the candidate lever was the count of serialized dynamic
# rolls — S/RB per pass, 3 passes, one roll each inside a fori_loop.
# Doubling RB halves the rolls at the cost of a wider tap set computing the
# SAME lerp (extra taps carry exact 0.0 weights; outputs agree to
# FMA-contraction rounding, tests/test_pallas_warp.py::
# test_fused_warp_rb_override_*). MEASURED NEUTRAL end-to-end: rb16 and
# rb32 both ≤0.3% vs the drift bracket on the flagship A/B (BENCH_NOTES
# round-4 warp-v5 entry) — the per-image 26 us is per-call/DMA overhead,
# not roll serialization. Knob kept for future hardware.
_RB_OVERRIDE: int | None = None  # set by tools/probe_flagship_ab.py


def _taps_for_slope(max_slope: float, rb: int = _RB) -> tuple:
    """Static tap offsets covering every per-row integer shift within an
    rb-row block. Rows sit at |y − y_mid| ≤ (rb−1)/2, so the row shift
    deviates from the block's mid-row shift by at most d = (rb−1)/2·|slope|;
    with kb = floor(s_mid), rel = floor(s_mid + δ) − kb ∈
    [floor(−d), floor(1+d)] and each row needs taps rel (weight 1−w) and
    rel+1 (weight w). Taps outside a row's pair get an exact 0.0 weight, so
    sizing the tap set to this bound is bit-identical — the 10° weak augment
    (|slope| ≤ sin 10° = 0.174) needs 4 taps at rb=8 (d = 0.61) where the
    legacy fixed set spent 6, and 6 taps at rb=16 (d = 1.30)."""
    import math

    d = (rb - 1) / 2.0 * float(max_slope) + 1e-3
    lo = math.floor(-d)
    hi = math.floor(1.0 + d) + 1
    return tuple(range(lo, hi + 1))


_TAPS_DEFAULT = (-2, -1, 0, 1, 2, 3)  # legacy bound: |slope| ≤ tan(15°)
_FORCE_LEGACY_TAPS = False  # A/B hook (tools/probe_flagship_ab.py)

# TIMING-ONLY kernel ablations for tools/probe_warp_micro.py — every value
# except "full" produces GARBAGE pixels and exists solely to attribute the
# per-image kernel time (zero-init / transpose / roll / tap-coefficient /
# DMA+cast floor). Never set outside that probe.
_ABLATE = "full"


def _fused_warp_kernel(p_ref, img_ref, out_ref, buf_a, buf_b, *, S, Sp,
                       mean, std, taps, rb, ablate="full"):
    """p_ref SMEM [3, 3] per-pass shear params (slope, offset, center):
    shift_row(y) = slope·(y − center) + offset. img_ref u8 [3, S, S];
    out_ref f32 [3, S, S]; buf_a/buf_b VMEM [3, S, Sp] ping-pong with a
    128-lane zero left margin (see _hshift_kernel for the roll trick)."""

    def shift_pass(src, dst, srow, normalize_out=False):
        slope = p_ref[srow, 0]
        offset = p_ref[srow, 1]
        center = p_ref[srow, 2]
        # per-block row iota [1, RB, 1], broadcasts against [3, RB, S]
        # (Mosaic iota must be integer-typed; cast after)
        riota = jax.lax.broadcasted_iota(
            jnp.int32, (1, rb, 1), 1).astype(jnp.float32)

        def body(b, _):
            y0 = (b * rb).astype(jnp.float32)
            # block-common integer shift from the mid-row shift
            s_mid = slope * (y0 + (rb - 1) / 2.0 - center) + offset
            kb = jnp.floor(s_mid).astype(jnp.int32)
            # per-row shift vector for this block
            s_vec = slope * (y0 + riota - center) + offset  # [1, RB, 1]
            k_vec = jnp.floor(s_vec)
            w = s_vec - k_vec  # [1, RB, 1] fractional part
            rel = k_vec.astype(jnp.int32) - kb  # within the tap bound
            rows = src[:, pl.ds(b * rb, rb), :]  # [3, RB, Sp]
            # one dynamic rotate per block; non-negative cyclic shift only
            # (compiled Mosaic mis-lowers negative traced rolls — see
            # _hshift_kernel)
            if ablate == "noroll":  # timing-only: skip the dynamic rotate
                rolled = rows
            else:
                rolled = pltpu.roll(rows, jnp.mod(-kb, Sp), axis=2)
            val = jnp.zeros((3, rb, S), jnp.float32)
            for d in taps:
                # tap_d[x] = src[x + kb + d]; row r needs d = k_r − kb
                # (weight 1−w) and d = k_r − kb + 1 (weight w)
                if ablate == "notaps":  # timing-only: constant weights
                    c_d = 0.25
                else:
                    c_d = jnp.where(rel == d, 1.0 - w, 0.0) + jnp.where(
                        rel == d - 1, w, 0.0)
                val = val + c_d * rolled[:, :, 128 + d : 128 + d + S]
            if normalize_out:
                # python-unrolled channels: scalars only, no captured consts
                for c in range(3):
                    m = float(mean[c]) * 255.0
                    sd = float(std[c]) * 255.0
                    out_ref[c, pl.ds(b * rb, rb), :] = (val[c] - m) / sd
            else:
                dst[:, pl.ds(b * rb, rb), 128 : 128 + S] = val
            return 0

        jax.lax.fori_loop(0, S // rb, body, 0)

    if ablate == "empty":  # timing-only: DMA + cast + normalize floor
        x = img_ref[:].astype(jnp.int32).astype(jnp.float32)
        for c in range(3):
            m = float(mean[c]) * 255.0
            sd = float(std[c]) * 255.0
            out_ref[c, :, :] = (x[c] - m) / sd
        return
    if ablate != "nozero":  # timing-only: skip the full-buffer inits
        zeros = jnp.zeros((3, S, Sp), jnp.float32)
        buf_a[:] = zeros
        buf_b[:] = zeros
    # Mosaic has no direct u8->f32 cast; hop through int32
    buf_a[:, :, 128 : 128 + S] = img_ref[:].astype(jnp.int32).astype(
        jnp.float32)
    shift_pass(buf_a, buf_b, 0)  # horizontal shear 1
    # transpose in VMEM for the vertical shear
    if ablate == "notranspose":  # timing-only: straight copy instead
        buf_a[:, :, 128 : 128 + S] = buf_b[:, :, 128 : 128 + S]
    else:
        buf_a[:, :, 128 : 128 + S] = jnp.swapaxes(
            buf_b[:, :, 128 : 128 + S], 1, 2)
    shift_pass(buf_a, buf_b, 1)  # vertical shear (as rows of the transpose)
    if ablate == "notranspose":
        buf_a[:, :, 128 : 128 + S] = buf_b[:, :, 128 : 128 + S]
    else:
        buf_a[:, :, 128 : 128 + S] = jnp.swapaxes(
            buf_b[:, :, 128 : 128 + S], 1, 2)
    shift_pass(buf_a, None, 2, normalize_out=True)  # shear 3 + normalize


def fused_warp_normalize(img_u8_planar, params, mean, std,
                         interpret: bool | None = None,
                         max_slope: float | None = None):
    """One image: u8 [3, S, S] + per-pass shear params [3, 3] rows of
    (slope, offset, center) — shift_row(y) = slope·(y−center) + offset —
    → normalized f32 [3, S, S]. ``max_slope`` bounds |slope| across the
    three passes and sizes the static tap set (_taps_for_slope); the
    default legacy set covers |slope| ≤ tan(15°)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    C, S, S2 = img_u8_planar.shape
    assert C == 3 and S == S2, "fused warp expects square RGB planar input"
    rb = _RB if _RB_OVERRIDE is None else _RB_OVERRIDE
    assert rb % _RB == 0, f"rows_per_block must be a multiple of {_RB}"
    if S % rb:
        rb = _RB  # fall back to the sublane tile for odd sizes
    assert S % rb == 0, f"image size must be a multiple of {rb}"
    taps = (_TAPS_DEFAULT if max_slope is None or _FORCE_LEGACY_TAPS
            else _taps_for_slope(max_slope, rb))
    if _FORCE_LEGACY_TAPS:
        rb = _RB  # the legacy fixed set only covers the 8-row bound
    Sp = ((S + 160 + 127) // 128) * 128  # 128 left margin + ≥32 right slack
    kernel = functools.partial(_fused_warp_kernel, S=S, Sp=Sp,
                               mean=tuple(mean), std=tuple(std), taps=taps,
                               rb=rb, ablate=_ABLATE)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, S, S), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            memory_space=pl.ANY if interpret else pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, S, Sp), jnp.float32),
            pltpu.VMEM((3, S, Sp), jnp.float32),
        ],
        interpret=interpret,
    )(params.astype(jnp.float32), img_u8_planar)


def weak_augment_batch_fused(images_u8, key, mean, std, degrees=10.0,
                             translate=0.02, use_pallas: bool | None = None,
                             keys=None):
    """Fused-kernel weak augmentation: same parameter distributions as
    weak_augment_batch_paeth, flip folded into the affine params.
    ``keys`` [B, 2, 2] overrides the per-image key derivation (see
    ops/augment.py::weak_augment_batch)."""
    B, H, W, _ = images_u8.shape
    if keys is None:
        keys = jax.random.split(key, 2 * B).reshape(B, 2, 2)

    def one(img, ks):
        k1, k2 = ks[0], ks[1]
        ka, kb, kc = jax.random.split(k1, 3)
        ang = jax.random.uniform(ka, (), minval=-degrees, maxval=degrees)
        tx = jax.random.uniform(kb, (), minval=-translate, maxval=translate) * W
        ty = jax.random.uniform(kc, (), minval=-translate, maxval=translate) * H
        flip = jax.random.bernoulli(k2, 0.5)
        # flip(affine(x; θ, tx, ty)) == affine(flip(x); −θ, −tx, ty)
        ang = jnp.where(flip, -ang, ang)
        tx = jnp.where(flip, -tx, tx)
        planar = img.transpose(2, 0, 1)  # u8 [3, H, W]
        planar = jnp.where(flip, planar[:, :, ::-1], planar)
        params = paeth_shift_params(jnp.deg2rad(ang), tx, ty, H, W)
        # slope bounds for RandomAffine(degrees): |α| ≤ tan(deg/2),
        # |β| ≤ sin(deg) — sizes the kernel's static tap set exactly
        import math

        rad = math.radians(float(degrees))
        ms = max(math.tan(rad / 2.0), math.sin(rad))
        out = fused_warp_normalize(planar, params, mean, std,
                                   interpret=not _use_pallas(use_pallas),
                                   max_slope=ms)
        return out.transpose(1, 2, 0)

    return jax.vmap(one)(images_u8, keys)


def weak_augment_batch_paeth(images_u8, key, mean, std, degrees=10.0,
                             translate=0.02, use_pallas: bool | None = None,
                             keys=None):
    """Drop-in replacement for ops.augment.weak_augment_batch: RandomAffine
    (10°, 2% translate) + RandomHorizontalFlip + Normalize, with the warp
    running as shear passes instead of gathers. Identical parameter
    distributions (same jax.random consumption order per image).
    ``keys`` [B, 2, 2] overrides the per-image key derivation."""
    B, H, W, _ = images_u8.shape
    if keys is None:
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
