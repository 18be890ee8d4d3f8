"""Device-side image augmentation.

The reference's augmentation runs on the host via PIL inside DataLoader
workers (reference: dataset/dataset.py:23-84, utils/FixMatch.py:20-220) —
that CPU path is the throughput bottleneck of the whole system. Here every
op is a pure-JAX function on uint8/float32 image batches living in HBM, so
augmentation fuses with the normalize + model forward under one jit:

  weak view   — Resize is done at ingest; RandomAffine(10°, 2% translate) +
                RandomHorizontalFlip + Normalize  (dataset/dataset.py:24-30)
  strong view — RandAugmentMC(n=2, m=10) pool of 14 PIL ops + CutoutAbs(16)
                (utils/FixMatch.py:147-163,205-220)

Geometric ops use inverse-map bilinear warps (static shapes) with an
optional gather-free Pallas roll-kernel path (``geo='shear'``, the TPU
default for the strong pipeline); photometric ops are elementwise VPU
work; Equalize's 256-bin histogram is a fused compare-and-reduce over
uint8 values (scatter-add serializes on TPU).

Images flow as float32 in [0, 255] until the final normalize, mirroring
PIL's uint8 domain semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

FILL_GRAY = 127.0  # CutoutAbs fill (utils/FixMatch.py:57)
PARAMETER_MAX = 10  # utils/FixMatch.py:17


# ----------------------------------------------------------------------
# Geometry: inverse-map bilinear warp
# ----------------------------------------------------------------------

def _bilinear_sample(img, src_x, src_y, fill=0.0):
    """Sample img [H, W, C] at float coords (src_x, src_y) [H, W]; out-of-
    bounds → fill (PIL pads black on affine/rotate)."""
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    dx = (src_x - x0)[..., None]
    dy = (src_y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yy, xx):
        inb = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
        v = img[jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]
        return jnp.where(inb[..., None], v, fill)

    top = tap(y0i, x0i) * (1 - dx) + tap(y0i, x0i + 1) * dx
    bot = tap(y0i + 1, x0i) * (1 - dx) + tap(y0i + 1, x0i + 1) * dx
    return top * (1 - dy) + bot * dy


def affine_warp(img, inv_mat, fill=0.0):
    """Warp img [H, W, C] with the PIL AFFINE convention: ``inv_mat`` is the
    2x3 matrix mapping output pixel (x, y) → source (x', y')
    (utils/FixMatch.py:96 uses (1, v, 0, 0, 1, 0) for ShearX)."""
    H, W = img.shape[0], img.shape[1]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] * jnp.ones((1, W), jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] * jnp.ones((H, 1), jnp.float32)
    a, b, c, d, e, f = (inv_mat[0, 0], inv_mat[0, 1], inv_mat[0, 2],
                        inv_mat[1, 0], inv_mat[1, 1], inv_mat[1, 2])
    src_x = a * xs + b * ys + c
    src_y = d * xs + e * ys + f
    return _bilinear_sample(img, src_x, src_y, fill)


def _center_affine(img_shape, a, b, d, e, tx=0.0, ty=0.0):
    """Inverse 2x3 matrix for a linear map about the image center plus a
    translation (in output coords)."""
    H, W = img_shape[0], img_shape[1]
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    c = cx - a * (cx + tx) - b * (cy + ty)
    f = cy - d * (cx + tx) - e * (cy + ty)
    # note: the matrix maps output (x,y): src = A·(out) + const where the
    # translation is applied before recentering
    c = cx - a * cx - b * cy + (a * -tx + b * -ty) + 0.0
    f = cy - d * cx - e * cy + (d * -tx + e * -ty) + 0.0
    return jnp.array([[a, b, c], [d, e, f]], jnp.float32)


def rotate(img, degrees):
    """PIL Image.rotate(v): counterclockwise about center, black fill."""
    th = jnp.deg2rad(degrees)
    cos, sin = jnp.cos(th), jnp.sin(th)
    # inverse of CCW rotation = CW rotation
    return affine_warp(img, _center_affine(img.shape, cos, -sin, sin, cos))


def shear_x(img, v):
    return affine_warp(img, jnp.array([[1.0, v, 0.0], [0.0, 1.0, 0.0]], jnp.float32))


def shear_y(img, v):
    return affine_warp(img, jnp.array([[1.0, 0.0, 0.0], [v, 1.0, 0.0]], jnp.float32))


def translate_x(img, pixels):
    return affine_warp(img, jnp.array([[1.0, 0.0, pixels], [0.0, 1.0, 0.0]], jnp.float32))


def translate_y(img, pixels):
    return affine_warp(img, jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, pixels]], jnp.float32))


def random_affine(img, key, degrees=10.0, translate=0.02):
    """torchvision RandomAffine(degrees=10, translate=(0.02, 0.02))
    (reference: dataset/dataset.py:26)."""
    H, W = img.shape[0], img.shape[1]
    k1, k2, k3 = jax.random.split(key, 3)
    ang = jax.random.uniform(k1, (), minval=-degrees, maxval=degrees)
    tx = jax.random.uniform(k2, (), minval=-translate, maxval=translate) * W
    ty = jax.random.uniform(k3, (), minval=-translate, maxval=translate) * H
    th = jnp.deg2rad(ang)
    cos, sin = jnp.cos(th), jnp.sin(th)
    return affine_warp(img, _center_affine(img.shape, cos, -sin, sin, cos, tx, ty))


def random_hflip(img, key, p=0.5):
    flip = jax.random.bernoulli(key, p)
    return jnp.where(flip, img[:, ::-1, :], img)


# ----------------------------------------------------------------------
# Photometric ops (PIL ImageEnhance / ImageOps semantics, 0..255 domain)
# ----------------------------------------------------------------------

def _gray(img):
    """PIL L-mode luma."""
    return img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114


def brightness(img, v):
    """ImageEnhance.Brightness: blend with black."""
    return jnp.clip(img * v, 0.0, 255.0)


def color(img, v):
    """ImageEnhance.Color: blend with grayscale."""
    g = _gray(img)[..., None]
    return jnp.clip(g + v * (img - g), 0.0, 255.0)


def contrast(img, v):
    """ImageEnhance.Contrast: blend with the mean of the L channel
    (PIL uses the integer-rounded mean)."""
    mean = jnp.round(jnp.mean(_gray(img)) + 0.5) - 0.5  # ~int(mean + 0.5)
    return jnp.clip(mean + v * (img - mean), 0.0, 255.0)


def sharpness(img, v):
    """ImageEnhance.Sharpness: blend with SMOOTH-filtered image
    (3x3 kernel [[1,1,1],[1,5,1],[1,1,1]]/13, edges kept)."""
    kernel = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    smoothed = jax.lax.conv_general_dilated(
        img.transpose(2, 0, 1)[:, None],  # [C, 1, H, W]
        kernel[None, None],  # [1, 1, 3, 3]
        (1, 1),
        "SAME",
    )[:, 0].transpose(1, 2, 0)
    # PIL keeps the 1-pixel border unchanged
    H, W = img.shape[0], img.shape[1]
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    border = (ys == 0) | (ys == H - 1) | (xs == 0) | (xs == W - 1)
    smoothed = jnp.where(border[..., None], img, smoothed)
    return jnp.clip(smoothed + v * (img - smoothed), 0.0, 255.0)


def posterize(img, bits):
    """ImageOps.posterize: keep ``bits`` high bits."""
    shift = (8 - bits).astype(jnp.uint8)
    x = img.astype(jnp.uint8)
    return ((x >> shift) << shift).astype(jnp.float32)


def solarize(img, threshold):
    """ImageOps.solarize: invert pixels >= threshold."""
    return jnp.where(img >= threshold, 255.0 - img, img)


def invert(img):
    return 255.0 - img


def autocontrast(img):
    """ImageOps.autocontrast(cutoff=0): per-channel min→0 max→255 stretch."""
    lo = img.min(axis=(0, 1), keepdims=True)
    hi = img.max(axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-6)
    out = (img - lo) * scale
    return jnp.where(hi > lo, jnp.clip(out, 0, 255), img)


def equalize(img):
    """ImageOps.equalize: per-channel histogram equalization with PIL's
    step/LUT construction.

    The 256-bin histogram is a compare-and-reduce over the uint8 pixel
    values, not a scatter-add: `.at[flat].add(1)` lowers to a serialized
    scatter on TPU (measured 767 ms for a vmapped 256-image batch vs
    ~30 ms for every other strong op — BENCH_NOTES round 5), while the
    fused compare-reduce reads the 49 KB uint8 plane per bin-tile from
    VMEM."""
    x = jnp.clip(jnp.round(img), 0, 255).astype(jnp.int32)

    def eq_channel(ch):
        flat = ch.reshape(-1)
        hist = jnp.sum(
            flat.astype(jnp.uint8)[None, :] ==
            jnp.arange(256, dtype=jnp.uint8)[:, None],
            axis=1, dtype=jnp.int32)
        nonzero = hist > 0
        # PIL: step = (total - last_nonzero_bin) // 255
        last_nz_val = jnp.max(jnp.where(nonzero, jnp.arange(256), -1))
        last_count = hist[last_nz_val]
        step = (flat.size - last_count) // 255
        csum = jnp.cumsum(hist)
        # lut[i] = (step//2 + csum[i-1]) // step  (csum shifted by one)
        csum_prev = jnp.concatenate([jnp.zeros((1,), csum.dtype), csum[:-1]])
        lut = (step // 2 + csum_prev) // jnp.maximum(step, 1)
        lut = jnp.clip(lut, 0, 255)
        out = lut[flat].reshape(ch.shape).astype(jnp.float32)
        return jnp.where(step == 0, ch.astype(jnp.float32), out)

    return jnp.stack([eq_channel(x[..., c]) for c in range(3)], axis=-1)


def solarize_add(img, v, threshold=128.0):
    """ImageOps.solarize after adding v (utils/FixMatch.py:111-120)."""
    shifted = jnp.clip(img + v, 0.0, 255.0)
    return jnp.where(shifted >= threshold, 255.0 - shifted, shifted)


def cutout_abs(img, key, size):
    """CutoutAbs (utils/FixMatch.py:47-60): gray square of side ~size at a
    uniform center."""
    H, W = img.shape[0], img.shape[1]
    kx, ky = jax.random.split(key)
    x0 = jax.random.uniform(kx, (), minval=0.0, maxval=W)
    y0 = jax.random.uniform(ky, (), minval=0.0, maxval=H)
    x0 = jnp.maximum(0.0, x0 - size / 2.0).astype(jnp.int32)
    y0 = jnp.maximum(0.0, y0 - size / 2.0).astype(jnp.int32)
    x1 = jnp.minimum(W, x0 + size)
    y1 = jnp.minimum(H, y0 + size)
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    inside = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)
    return jnp.where(inside[..., None], FILL_GRAY, img)


# ----------------------------------------------------------------------
# RandAugmentMC (utils/FixMatch.py:205-220): n ops at p=0.5 + Cutout(16)
# ----------------------------------------------------------------------

def _rand_sign(key, v):
    return jnp.where(jax.random.bernoulli(key, 0.5), -v, v)


def _geo_matrices(img_shape, ks, v, translate_frac):
    """Inverse 2x3 matrices for the pool's five geometric ops + identity,
    from the SAME ``ks`` sign/magnitude draws the per-op branches make.
    Order: [rotate, shear_x, shear_y, translate_x, translate_y, identity].
    """
    H, W = img_shape[0], img_shape[1]
    th = jnp.deg2rad(_rand_sign(ks, jnp.floor(v * 30 / PARAMETER_MAX)))
    cos, sin = jnp.cos(th), jnp.sin(th)
    sv = _rand_sign(ks, v * 0.3 / PARAMETER_MAX)
    px = _rand_sign(ks, jnp.floor(v * translate_frac / PARAMETER_MAX * W))
    py = _rand_sign(ks, jnp.floor(v * translate_frac / PARAMETER_MAX * H))
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    return jnp.stack([
        _center_affine(img_shape, cos, -sin, sin, cos),
        jnp.array([[one, sv, zero], [zero, one, zero]], jnp.float32),
        jnp.array([[one, zero, zero], [sv, one, zero]], jnp.float32),
        jnp.array([[one, zero, px], [zero, one, zero]], jnp.float32),
        jnp.array([[one, zero, zero], [zero, one, py]], jnp.float32),
        jnp.array([[one, zero, zero], [zero, one, zero]], jnp.float32),
    ])


def _geo_shear_warp(img, gi, ks, v, translate_frac, use_pallas=None):
    """The five pool geometric ops (+ identity) as exactly THREE per-row
    shear passes (h, v, h) over the Pallas roll kernel — the gather-free
    TPU formulation (ops/pallas_warp.py::hshift_rows_pallas):

      rotate      — Paeth three-shear decomposition (paeth_shift_vectors)
      shear_x     — src_x = x + v·y → h-pass shifts v·y, rest zero
      shear_y     — src_y = y + v·x → v-pass shifts v·x, rest zero
      translate   — uniform integer shift (exact: frac = 0 ⇒ pure copy)
      identity    — all-zero shifts (exact copy)

    A zero-shift pass is an exact copy, so every op runs the same 3-pass
    program and only the selected shift VECTORS differ (cheap [H]/[W]
    math). Single-axis shears/translates match the bilinear affine_warp
    (dy=0 ⇒ bilinear degenerates to the same 2-tap row lerp, same zero
    fill); rotation interpolates via three 1-D lerps instead of one
    bilinear — the same accepted backend difference as the weak
    'pallas'/'fused' vs 'gather' warps. Shift magnitudes stay under the
    kernel's ±96 margin and the jnp reference's ±64 pad for the MC pool
    at the reference m=10 (v ≤ 9: translate ≤ 60, rotate-pass ≤ 51,
    shear ≤ 61 at 224px); the PC pool's fixed v=10 translate
    (0.45·224 = 100) exceeds the margin, so PC keeps the gather path."""
    from fedmlp_tpu.ops.pallas_warp import (hshift_rows_jnp,
                                            hshift_rows_pallas,
                                            paeth_shift_vectors)
    H, W = img.shape[0], img.shape[1]
    th = jnp.deg2rad(_rand_sign(ks, jnp.floor(v * 30 / PARAMETER_MAX)))
    sv = _rand_sign(ks, v * 0.3 / PARAMETER_MAX)
    px = _rand_sign(ks, jnp.floor(v * translate_frac / PARAMETER_MAX * W))
    py = _rand_sign(ks, jnp.floor(v * translate_frac / PARAMETER_MAX * H))
    p1, p2, p3 = paeth_shift_vectors(th, 0.0, 0.0, H, W)
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    zH = jnp.zeros((H,), jnp.float32)
    zW = jnp.zeros((W,), jnp.float32)
    # slot order: rotate, shear_x, shear_y, translate_x, translate_y, id
    S1 = jnp.stack([p1, sv * ys, zH, px + zH, zH, zH])
    S2 = jnp.stack([p2, zW, sv * xs, zW, py + zW, zW])
    S3 = jnp.stack([p3, zH, zH, zH, zH, zH])
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    shift = hshift_rows_pallas if use_pallas else hshift_rows_jnp
    x = img.transpose(2, 0, 1)  # [C, H, W]
    x = shift(x, S1[gi])
    x = jnp.swapaxes(x, 1, 2)  # [C, W, H]
    x = shift(x, S2[gi])
    x = jnp.swapaxes(x, 1, 2)
    x = shift(x, S3[gi])
    return x.transpose(1, 2, 0)


def _randaugment_op(img, op_idx, v_int, key, geo="gather"):
    """One op from fixmatch_augment_pool (utils/FixMatch.py:147-163).
    ``v_int`` is the integer magnitude randint(1, m); float/int parameter
    scaling follows _float_parameter/_int_parameter.

    Restructured for batched (vmapped) TPU execution: a vmapped
    ``lax.switch`` computes EVERY branch and selects, so the original
    14-branch form ran five bilinear warps per image per layer. Here the
    five geometric ops select their 2x3 matrix (scalar math) into ONE
    shared warp, and only the nine photometric branches stay in the
    switch — the chosen op's output matches the per-op form (same
    matrices, same ``ks`` draws, same branch code; tests/test_augment.py).
    ``geo``: 'gather' = bilinear affine_warp; 'shear' = the Pallas
    roll-kernel three-pass form (_geo_shear_warp)."""
    ks, ko = jax.random.split(key)
    v = v_int.astype(jnp.float32)

    # op_idx → geometric matrix slot (5 = identity): rotate=7, shear_x=9,
    # shear_y=10, translate_x=12, translate_y=13
    geo_slot = jnp.array([5, 5, 5, 5, 5, 5, 5, 0, 5, 1, 2, 5, 3, 4])
    if geo == "shear":
        geo_out = _geo_shear_warp(img, geo_slot[op_idx], ks, v, 0.3)
    else:
        mats = _geo_matrices(img.shape, ks, v, 0.3)
        geo_out = affine_warp(img, mats[geo_slot[op_idx]])
    is_geo = geo_slot[op_idx] != 5

    # op_idx → photometric branch (identity for geometric slots)
    pho_slot = jnp.array([0, 1, 2, 3, 4, 5, 6, 5, 7, 5, 5, 8, 5, 5])
    pho_branches = [
        lambda im: autocontrast(im),                                       # 0
        lambda im: brightness(im, v * 0.9 / PARAMETER_MAX + 0.05),         # 1
        lambda im: color(im, v * 0.9 / PARAMETER_MAX + 0.05),              # 2
        lambda im: contrast(im, v * 0.9 / PARAMETER_MAX + 0.05),           # 3
        lambda im: equalize(im),                                           # 4
        lambda im: im,                                                     # 5 identity
        lambda im: posterize(im, (v * 4 // PARAMETER_MAX).astype(jnp.int32) + 4),  # 6
        lambda im: sharpness(im, v * 0.9 / PARAMETER_MAX + 0.05),          # 7
        lambda im: solarize(im, 256.0 - jnp.floor(v * 256 / PARAMETER_MAX)),  # 8
    ]
    pho_out = jax.lax.switch(pho_slot[op_idx], pho_branches, img)
    return jnp.where(is_geo, geo_out, pho_out)


def randaugment_mc(img, key, n=2, m=10, cutout=16, geo="gather"):
    """RandAugmentMC(n, m) on one image [H, W, 3] float32 0..255."""
    keys = jax.random.split(key, n + 1)
    for i in range(n):
        kop, kv, kp, kapply = jax.random.split(keys[i], 4)
        op_idx = jax.random.randint(kop, (), 0, 14)
        v_int = jax.random.randint(kv, (), 1, m)  # np.random.randint(1, m)
        do = jax.random.bernoulli(kp, 0.5)
        auged = _randaugment_op(img, op_idx, v_int, kapply, geo=geo)
        img = jnp.where(do, auged, img)
    return cutout_abs(img, keys[n], cutout)


def _randaugment_pc_op(img, op_idx, m, key):
    """One op from my_augment_pool (utils/FixMatch.py:166-184): 16 ops with
    fixed magnitude v = m and PC-specific (max_v, bias) scaling.

    Same one-warp restructure as ``_randaugment_op`` (matrix-select into a
    single shared ``affine_warp``; photometric-only switch)."""
    ks, _ = jax.random.split(key)
    v = jnp.float32(m)
    size = min(img.shape[0], img.shape[1])

    # op_idx → geometric matrix slot (5 = identity): rotate=8, shear_x=10,
    # shear_y=11, translate_x=14, translate_y=15
    geo_slot = jnp.array([5, 5, 5, 5, 5, 5, 5, 5, 0, 5, 1, 2, 5, 5, 3, 4])
    mats = _geo_matrices(img.shape, ks, v, 0.45)
    geo_out = affine_warp(img, mats[geo_slot[op_idx]])
    is_geo = geo_slot[op_idx] != 5

    pho_slot = jnp.array([0, 1, 2, 3, 4, 5, 6, 7, 11, 8, 11, 11, 9, 10,
                          11, 11])
    pho_branches = [
        lambda im: autocontrast(im),                                        # 0
        lambda im: brightness(im, v * 1.8 / PARAMETER_MAX + 0.1),           # 1
        lambda im: color(im, v * 1.8 / PARAMETER_MAX + 0.1),                # 2
        lambda im: contrast(im, v * 1.8 / PARAMETER_MAX + 0.1),             # 3
        lambda im: cutout_abs(im, ks, jnp.floor(v * 0.2 / PARAMETER_MAX * size)),  # 4
        lambda im: equalize(im),                                            # 5
        lambda im: invert(im),                                              # 6
        lambda im: posterize(im, (v * 4 // PARAMETER_MAX).astype(jnp.int32) + 4),  # 7
        lambda im: sharpness(im, v * 1.8 / PARAMETER_MAX + 0.1),            # 8
        lambda im: solarize(im, 256.0 - jnp.floor(v * 256 / PARAMETER_MAX)),  # 9
        lambda im: solarize_add(im, _rand_sign(ks, jnp.floor(v * 110 / PARAMETER_MAX))),  # 10
        lambda im: im,                                                      # 11 identity
    ]
    pho_out = jax.lax.switch(pho_slot[op_idx], pho_branches, img)
    return jnp.where(is_geo, geo_out, pho_out)


def randaugment_pc(img, key, n=2, m=10, cutout=16):
    """RandAugmentPC (utils/FixMatch.py:187-202): n ops at fixed magnitude
    m, each applied with probability random()+U(0.2,0.8) >= 1, then
    CutoutAbs(16)."""
    keys = jax.random.split(key, n + 1)
    for i in range(n):
        kop, kprob, kp, kapply = jax.random.split(keys[i], 4)
        op_idx = jax.random.randint(kop, (), 0, 16)
        prob = jax.random.uniform(kprob, (), minval=0.2, maxval=0.8)
        do = jax.random.uniform(kp) + prob >= 1.0
        auged = _randaugment_pc_op(img, op_idx, m, kapply)
        img = jnp.where(do, auged, img)
    return cutout_abs(img, keys[n], cutout)


# ----------------------------------------------------------------------
# Batch pipelines
# ----------------------------------------------------------------------

def normalize(img, mean, std):
    """ToTensor + Normalize: [0,255] → ((x/255) - mean)/std."""
    mean = jnp.asarray(mean, jnp.float32) * 255.0
    std = jnp.asarray(std, jnp.float32) * 255.0
    return (img - mean) / std


def weak_augment_batch(images_u8, key, mean, std, degrees=10.0, translate=0.02,
                       keys=None):
    """Weak view for a batch [B, H, W, 3] uint8 → normalized float32.

    ``keys`` [B, 2, 2] overrides the internal per-image key derivation —
    the lockstep engine passes shard-invariant per-(client, image) keys so
    a client-sharded round consumes identical randomness to the unsharded
    one (parallel/fl_runtime.py::make_lockstep_local_round)."""
    B = images_u8.shape[0]
    if keys is None:
        keys = jax.random.split(key, 2 * B).reshape(B, 2, 2)

    def one(img, ks):
        x = img.astype(jnp.float32)
        x = random_affine(x, ks[0], degrees, translate)
        x = random_hflip(x, ks[1])
        return normalize(x, mean, std)

    return jax.vmap(one)(images_u8, keys)


def _random_affine_shear(img, key, degrees, translate):
    """random_affine with the Paeth three-shear warp instead of the
    bilinear gather — identical parameter draws (same key consumption),
    the weak 'pallas' backend's interpolation (pallas_warp.paeth_affine)."""
    from fedmlp_tpu.ops.pallas_warp import paeth_affine
    H, W = img.shape[0], img.shape[1]
    k1, k2, k3 = jax.random.split(key, 3)
    ang = jax.random.uniform(k1, (), minval=-degrees, maxval=degrees)
    tx = jax.random.uniform(k2, (), minval=-translate, maxval=translate) * W
    ty = jax.random.uniform(k3, (), minval=-translate, maxval=translate) * H
    planar = img.transpose(2, 0, 1)
    return paeth_affine(planar, jnp.deg2rad(ang), tx, ty).transpose(1, 2, 0)


def strong_augment_batch(images_u8, key, mean, std, n=2, m=10,
                         degrees=10.0, translate=0.02, keys=None,
                         geo="gather"):
    """Strong view: weak geometric prefix + RandAugmentMC + normalize
    (reference: dataset/dataset.py:70-77). ``keys`` [B, 3, 2] overrides the
    per-image key derivation (see weak_augment_batch). ``geo='shear'``
    runs every warp (prefix affine + pool geometric ops) through the
    Pallas roll kernel instead of bilinear gathers — the TPU path
    (fl_runtime._pick_strong_backend): gathers made the original strong
    pipeline ~70x slower than the weak warp per image (BENCH_NOTES
    round 5)."""
    B = images_u8.shape[0]
    if keys is None:
        keys = jax.random.split(key, 3 * B).reshape(B, 3, 2)

    def one(img, ks):
        x = img.astype(jnp.float32)
        if geo == "shear":
            x = _random_affine_shear(x, ks[0], degrees, translate)
        else:
            x = random_affine(x, ks[0], degrees, translate)
        x = random_hflip(x, ks[1])
        x = randaugment_mc(x, ks[2], n=n, m=m, geo=geo)
        return normalize(x, mean, std)

    return jax.vmap(one)(images_u8, keys)


def eval_batch(images_u8, mean, std):
    """Test transform: normalize only (resize happened at ingest)."""
    return normalize(images_u8.astype(jnp.float32), mean, std)


@partial(jax.jit, static_argnames=("mode",))
def augment_pair(images_u8, key, mean, std, mode="dual_weak"):
    """Two independently-augmented views per sample in one pass
    (reference consumes image_aug_1/image_aug_2,
    utils/local_training.py:935-936). mode: 'dual_weak' | 'weak_strong'."""
    k1, k2 = jax.random.split(key)
    v1 = weak_augment_batch(images_u8, k1, mean, std)
    if mode == "dual_weak":
        v2 = weak_augment_batch(images_u8, k2, mean, std)
    else:
        v2 = strong_augment_batch(images_u8, k2, mean, std)
    return v1, v2
