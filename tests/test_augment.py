"""Device-side augmentation ops: PIL-semantics checks + pipeline shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fedmlp_tpu.ops import augment as A

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


@pytest.fixture
def img(rng):
    return jnp.asarray(rng.randint(0, 255, (24, 24, 3)).astype(np.float32))


def test_posterize_matches_pil_semantics(img):
    out = np.asarray(A.posterize(img, jnp.int32(4)))
    want = (np.asarray(img).astype(np.uint8) >> 4) << 4
    np.testing.assert_array_equal(out, want.astype(np.float32))


def test_solarize(img):
    out = np.asarray(A.solarize(img, 128.0))
    x = np.asarray(img)
    want = np.where(x >= 128, 255 - x, x)
    np.testing.assert_allclose(out, want)


def test_solarize_add(img):
    out = np.asarray(A.solarize_add(img, 30.0))
    x = np.clip(np.asarray(img) + 30, 0, 255)
    want = np.where(x >= 128, 255 - x, x)
    np.testing.assert_allclose(out, want)


def test_invert_autocontrast_bounds(img):
    inv = np.asarray(A.invert(img))
    np.testing.assert_allclose(inv, 255 - np.asarray(img))
    ac = np.asarray(A.autocontrast(img))
    assert ac.min() >= -1e-4 and ac.max() <= 255 + 1e-4
    # autocontrast stretches each channel to the full range
    assert ac.max() == pytest.approx(255, abs=1e-3)


def test_equalize_flattens_histogram():
    rng = np.random.RandomState(0)
    # concentrated intensities → equalize must spread them
    x = jnp.asarray((rng.rand(32, 32, 3) * 40 + 100).astype(np.float32))
    out = np.asarray(A.equalize(x))
    assert out.std() > np.asarray(x).std()


def test_brightness_contrast_color_identity(img):
    for op in (A.brightness, A.contrast, A.color, A.sharpness):
        out = np.asarray(op(img, 1.0))
        np.testing.assert_allclose(out, np.asarray(img), atol=0.51)


def test_rotate_translate_shear_shapes(img):
    for op, arg in ((A.rotate, 15.0), (A.shear_x, 0.2), (A.shear_y, -0.2),
                    (A.translate_x, 5.0), (A.translate_y, -5.0)):
        out = op(img, arg)
        assert out.shape == img.shape


def test_randaugment_variants_run(img):
    key = jax.random.PRNGKey(0)
    mc = A.randaugment_mc(img, key)
    pc = A.randaugment_pc(img, key)
    assert mc.shape == img.shape and pc.shape == img.shape
    assert np.isfinite(np.asarray(mc)).all()
    assert np.isfinite(np.asarray(pc)).all()


def test_strong_batch_jit(rng):
    imgs = jnp.asarray(rng.randint(0, 255, (4, 24, 24, 3)).astype(np.uint8))
    out = jax.jit(
        lambda x, k: A.strong_augment_batch(x, k, MEAN, STD)
    )(imgs, jax.random.PRNGKey(1))
    assert out.shape == (4, 24, 24, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_cutout_fills_gray(img):
    out = np.asarray(A.cutout_abs(img, jax.random.PRNGKey(3), 8))
    assert (out == A.FILL_GRAY).any()


def test_auto_backend_weak_strong_fallback():
    """'auto' must NOT resolve to the fused warp kernel for weak+strong
    (FixMatch-style) programs on TPU: that combination has crashed the
    TPU worker at scale twice (K=20 B=32 224px — round-3 session 5 and
    the round-4 ladder rung 5) vs once for the v1 'pallas' pipeline.
    The fault is flaky and libtpu-level (BENCH_NOTES round-4 ladder
    section); 'pallas' is the least-crashing choice, and long
    weak_strong runs should go through tools/resilient_run.py."""
    from fedmlp_tpu.parallel.fl_runtime import resolve_augment_backend

    assert resolve_augment_backend("auto", "weak_strong", "tpu") == "pallas"
    assert resolve_augment_backend("auto", "dual", "tpu") == "fused"
    assert resolve_augment_backend("auto", "single", "tpu") == "fused"
    assert resolve_augment_backend("auto", "weak_strong", "cpu") == "gather"
    # explicit backends are never overridden
    assert resolve_augment_backend("fused", "weak_strong", "tpu") == "fused"
    # second-level fallback (VERDICT r4 item 4): at scale (K·B >= the
    # threshold, e.g. the crashing K=20 B=32 config) 'auto' routes
    # weak_strong to 'gather' — the only weak backend that PASSED the
    # fixmatch-at-scale crash config (round-3 probe matrix)
    assert resolve_augment_backend(
        "auto", "weak_strong", "tpu", scale=640) == "gather"
    assert resolve_augment_backend(
        "auto", "weak_strong", "tpu", scale=128) == "pallas"
    assert resolve_augment_backend(
        "auto", "dual", "tpu", scale=640) == "fused"  # no strong view
    assert resolve_augment_backend(
        "auto", "weak_strong", "cpu", scale=640) == "gather"


def test_randaugment_op_matches_per_op_branches(img):
    """The one-warp restructure of _randaugment_op/_randaugment_pc_op must
    reproduce each pool op (same matrices, same `ks` draws) as
    calling the op directly — the form the reference applies per-op
    (utils/FixMatch.py:147-184)."""
    key = jax.random.PRNGKey(42)
    ks, _ = jax.random.split(key)
    v_int = jnp.int32(7)
    v = jnp.float32(7)
    P = A.PARAMETER_MAX
    H, W = img.shape[0], img.shape[1]

    mc_direct = [
        A.autocontrast(img),
        A.brightness(img, v * 0.9 / P + 0.05),
        A.color(img, v * 0.9 / P + 0.05),
        A.contrast(img, v * 0.9 / P + 0.05),
        A.equalize(img),
        img,
        A.posterize(img, (v * 4 // P).astype(jnp.int32) + 4),
        A.rotate(img, A._rand_sign(ks, jnp.floor(v * 30 / P))),
        A.sharpness(img, v * 0.9 / P + 0.05),
        A.shear_x(img, A._rand_sign(ks, v * 0.3 / P)),
        A.shear_y(img, A._rand_sign(ks, v * 0.3 / P)),
        A.solarize(img, 256.0 - jnp.floor(v * 256 / P)),
        A.translate_x(img, A._rand_sign(ks, jnp.floor(v * 0.3 / P * W))),
        A.translate_y(img, A._rand_sign(ks, jnp.floor(v * 0.3 / P * H))),
    ]
    # lax.switch compiles its branch in a different fusion context than
    # the eager per-op call, so both the OLD 14-branch form and this
    # restructure sit 1 ulp from the direct call; 0.01 on the 0..255
    # domain still catches any wrong matrix/scale/slot.
    for op in range(14):
        got = A._randaugment_op(img, jnp.int32(op), v_int, key)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(mc_direct[op]),
                                   atol=0.01, err_msg=f"MC op {op}")

    size = min(H, W)
    pc_direct = [
        A.autocontrast(img),
        A.brightness(img, v * 1.8 / P + 0.1),
        A.color(img, v * 1.8 / P + 0.1),
        A.contrast(img, v * 1.8 / P + 0.1),
        A.cutout_abs(img, ks, jnp.floor(v * 0.2 / P * size)),
        A.equalize(img),
        A.invert(img),
        A.posterize(img, (v * 4 // P).astype(jnp.int32) + 4),
        A.rotate(img, A._rand_sign(ks, jnp.floor(v * 30 / P))),
        A.sharpness(img, v * 1.8 / P + 0.1),
        A.shear_x(img, A._rand_sign(ks, v * 0.3 / P)),
        A.shear_y(img, A._rand_sign(ks, v * 0.3 / P)),
        A.solarize(img, 256.0 - jnp.floor(v * 256 / P)),
        A.solarize_add(img, A._rand_sign(ks, jnp.floor(v * 110 / P))),
        A.translate_x(img, A._rand_sign(ks, jnp.floor(v * 0.45 / P * W))),
        A.translate_y(img, A._rand_sign(ks, jnp.floor(v * 0.45 / P * H))),
    ]
    for op in range(16):
        got = A._randaugment_pc_op(img, jnp.int32(op), 7, key)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(pc_direct[op]),
                                   atol=0.01, err_msg=f"PC op {op}")


def test_geo_shear_matches_gather_for_separable_ops(img):
    """geo='shear' (Pallas roll-kernel path; jnp reference off-TPU) must
    match the bilinear gather warp for the single-axis ops, where the
    bilinear degenerates to the same 2-tap row lerp: shear_x/y,
    translate_x/y (exact integer shifts), identity."""
    key = jax.random.PRNGKey(3)
    for op in (5, 9, 10, 12, 13):
        a = A._randaugment_op(img, jnp.int32(op), jnp.int32(8), key,
                              geo="gather")
        b = A._randaugment_op(img, jnp.int32(op), jnp.int32(8), key,
                              geo="shear")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, err_msg=f"op {op}")


def test_geo_shear_rotation_on_linear_ramp():
    """Rotation interpolates differently (Paeth three 1-D lerps vs one
    bilinear), but both reproduce LINEAR images exactly, so away from the
    fill borders they must agree."""
    H = W = 32
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ramp = jnp.stack([ys + xs, 2 * ys + 0.5 * xs,
                      100.0 + xs + 0 * ys], axis=-1)
    key = jax.random.PRNGKey(5)
    a = A._randaugment_op(ramp, jnp.int32(7), jnp.int32(8), key,
                          geo="gather")
    b = A._randaugment_op(ramp, jnp.int32(7), jnp.int32(8), key,
                          geo="shear")
    c = 12  # crop beyond both fills' reach (24° rotation at 32px)
    np.testing.assert_allclose(np.asarray(a)[c:-c, c:-c],
                               np.asarray(b)[c:-c, c:-c], atol=1e-2)


def test_strong_batch_shear_runs(rng):
    imgs = jnp.asarray(rng.randint(0, 255, (4, 24, 24, 3)).astype(np.uint8))
    out = jax.jit(
        lambda x, k: A.strong_augment_batch(x, k, MEAN, STD, geo="shear")
    )(imgs, jax.random.PRNGKey(1))
    assert out.shape == (4, 24, 24, 3)
    assert np.isfinite(np.asarray(out)).all()
