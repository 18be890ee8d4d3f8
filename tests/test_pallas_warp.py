"""Paeth shear warp: kernel parity, shift-vector math, warp equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fedmlp_tpu.ops import augment as A
from fedmlp_tpu.ops.pallas_warp import (
    hshift_rows_jnp,
    hshift_rows_pallas,
    paeth_affine,
    paeth_shift_vectors,
)


def test_hshift_pallas_matches_jnp(rng):
    x = rng.rand(3, 24, 40).astype(np.float32)
    shifts = rng.uniform(-10, 10, 24).astype(np.float32)
    got = np.asarray(hshift_rows_pallas(jnp.asarray(x), jnp.asarray(shifts),
                                        interpret=True))
    want = np.asarray(hshift_rows_jnp(jnp.asarray(x), jnp.asarray(shifts)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_hshift_integer_shift_is_exact_translation(rng):
    x = rng.rand(1, 8, 32).astype(np.float32)
    shifts = np.full(8, 3.0, np.float32)
    out = np.asarray(hshift_rows_jnp(jnp.asarray(x), jnp.asarray(shifts)))
    # out[x] = in[x+3]; last 3 columns fall off into zero padding
    np.testing.assert_allclose(out[0, :, :-3], x[0, :, 3:], rtol=1e-6)
    np.testing.assert_allclose(out[0, :, -3:], 0.0, atol=1e-6)


def test_paeth_composition_matches_affine_map():
    """The 3-pass shift composition must reproduce the single-pass inverse
    affine map: check on coordinate ramp images where bilinear sampling of
    a linear function is exact (interior pixels)."""
    H = W = 48
    theta, tx, ty = 0.15, 2.5, -1.5  # ~8.6°
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    for ramp in (xs, ys):
        planar = jnp.asarray(ramp[None])
        got = np.asarray(paeth_affine(planar, theta, tx, ty, use_pallas=False))[0]
        # expected: value at src coords (linear ramp → exact interpolation)
        cx, cy = (W - 1) / 2, (H - 1) / 2
        cos, sin = np.cos(theta), np.sin(theta)
        C = cx - cos * cx + sin * cy + (cos * -tx + (-sin) * -ty)
        F = cy - sin * cx - cos * cy + (sin * -tx + cos * -ty)
        src_x = cos * xs - sin * ys + C
        src_y = sin * xs + cos * ys + F
        want = src_x if ramp is xs else src_y
        inside = (
            (src_x > 6) & (src_x < W - 7) & (src_y > 6) & (src_y < H - 7)
        )
        np.testing.assert_allclose(got[inside], want[inside], atol=0.15)


def test_paeth_identity_roundtrip(rng):
    x = rng.rand(3, 32, 32).astype(np.float32)
    out = np.asarray(paeth_affine(jnp.asarray(x), 0.0, 0.0, 0.0, use_pallas=False))
    np.testing.assert_allclose(out, x, atol=1e-5)


def test_weak_augment_paeth_close_to_gather_warp(rng):
    """Same RNG consumption → same affine params; the 3-pass resampling
    agrees with the single-pass bilinear warp closely on smooth images."""
    from scipy.ndimage import gaussian_filter

    from fedmlp_tpu.ops.pallas_warp import weak_augment_batch_paeth

    raw = rng.rand(2, 48, 48, 3) * 255
    smooth = gaussian_filter(raw, sigma=(0, 3, 3, 0)).astype(np.uint8)
    key = jax.random.PRNGKey(5)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    a = np.asarray(A.weak_augment_batch(jnp.asarray(smooth), key, mean, std))
    b = np.asarray(
        weak_augment_batch_paeth(jnp.asarray(smooth), key, mean, std,
                                 use_pallas=False)
    )
    # compare interior (border fill paths differ slightly)
    diff = np.abs(a - b)[:, 10:-10, 10:-10, :]
    assert np.median(diff) < 0.05
    assert diff.mean() < 0.12


def test_fused_warp_matches_paeth_pipeline():
    """The single-kernel fused warp (v2) == the 3-kernel paeth pipeline,
    including the flip-folded-into-params equivalence
    (flip∘affine(θ,tx,ty) ≡ affine(−θ,−tx,ty)∘flip)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fedmlp_tpu.ops.pallas_warp import (weak_augment_batch_fused,
                                            weak_augment_batch_paeth)

    imgs = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (6, 64, 64, 3), np.uint8))
    key = jax.random.PRNGKey(42)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    a = weak_augment_batch_fused(imgs, key, mean, std, use_pallas=False)
    b = weak_augment_batch_paeth(imgs, key, mean, std, use_pallas=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


def test_fused_warp_rb_override_matches_default():
    """v5 wider shear blocks (fewer serialized dynamic rolls) compute the
    SAME lerp — the wider tap set covers every per-row integer shift in the
    block and the extra taps carry exact 0.0 weights (see _taps_for_slope;
    a numpy replica of the kernel math is exactly equal across rb). The
    compiled/interpreted outputs may differ by FMA-contraction rounding
    (different tap counts → different fusion shapes), so compare to 1-ulp
    tolerance on the normalized scale."""
    from fedmlp_tpu.ops import pallas_warp

    imgs = jnp.asarray(
        np.random.RandomState(3).randint(0, 256, (4, 64, 64, 3), np.uint8))
    key = jax.random.PRNGKey(7)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    base = np.asarray(pallas_warp.weak_augment_batch_fused(
        imgs, key, mean, std, use_pallas=False))
    for rb in (16, 32):
        pallas_warp._RB_OVERRIDE = rb
        try:
            got = np.asarray(pallas_warp.weak_augment_batch_fused(
                imgs, key, mean, std, use_pallas=False))
        finally:
            pallas_warp._RB_OVERRIDE = None
        np.testing.assert_allclose(got, base, rtol=0, atol=3e-6)


def test_taps_for_slope_covers_block_bound():
    """The rb-parametrized tap set must cover rel ∈ [floor(−d), floor(1+d)]
    plus the +1 lerp partner for d = (rb−1)/2·slope."""
    import math

    from fedmlp_tpu.ops.pallas_warp import _taps_for_slope

    for rb in (8, 16, 32):
        for slope in (0.05, 0.1736, 0.2679):  # up to tan(15°)
            taps = _taps_for_slope(slope, rb)
            d = (rb - 1) / 2.0 * slope
            assert taps[0] <= math.floor(-d)
            assert taps[-1] >= math.floor(1.0 + d) + 1


def test_roll_shift_sign_semantics():
    """Cyclic-shift equivalence used by the non-negative-mod workaround:
    roll(x, mod(-k, W)) == roll(x, -k) for positive and negative k (the
    compiled Mosaic lowering of negative traced shifts was observed wrong
    on device; interpret mode checks the arithmetic identity)."""
    import jax.numpy as jnp
    import numpy as np

    from fedmlp_tpu.ops.pallas_warp import hshift_rows_jnp, hshift_rows_pallas

    planar = jnp.asarray(
        np.random.RandomState(1).rand(3, 16, 64).astype(np.float32))
    for sval in (5.3, -7.8, 0.0, 31.9, -31.9):
        shifts = jnp.full((16,), sval, jnp.float32)
        got = hshift_rows_pallas(planar, shifts, interpret=True)
        ref = hshift_rows_jnp(planar, shifts)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_roll_call_sites_are_mod_normalized():
    """Lint-style guard for the negative-roll Mosaic miscompile: compiled
    TPU mis-lowers NEGATIVE traced pltpu.roll shifts (interpret mode is
    fine, so a behavioral CI test cannot catch a regression off-TPU).
    Statically require every pltpu.roll call site in ops/ to pass a shift
    that is either a jnp.mod(...) expression inline or a local name whose
    every assignment is a jnp.mod(...) expression."""
    import re
    import pathlib

    import fedmlp_tpu.ops as ops_pkg

    ops_dir = pathlib.Path(ops_pkg.__file__).parent
    call_re = re.compile(r"pltpu\.roll\(\s*([^,]+),\s*([^,]+),")
    for path in sorted(ops_dir.glob("*.py")):
        src = path.read_text()
        # names assigned from a jnp.mod(...) expression anywhere in the file
        mod_names = set(re.findall(r"(\w+)\s*=\s*jnp\.mod\(", src))
        for m in call_re.finditer(src):
            shift = m.group(2).strip()
            ok = "mod(" in shift or shift in mod_names
            assert ok, (
                f"{path.name}: pltpu.roll shift {shift!r} is not "
                "mod-normalized — negative traced shifts miscompile on TPU "
                "(see _hshift_kernel)"
            )
