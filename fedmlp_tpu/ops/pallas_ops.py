"""Pallas TPU kernels for the preprocessing hot path.

The reference's per-image PIL chain (dataset/dataset.py:23-84) becomes, on
TPU, a single fused VMEM pass per image batch. XLA already fuses most of
the elementwise chain; these kernels make the fusion *guaranteed* and add
the pieces XLA schedules poorly:

  * fused_normalize_flip_cutout — uint8 → f32 ToTensor+Normalize with
    optional horizontal flip and Cutout square, one read + one write per
    pixel (the flip is a lane-dimension reversal done during the same
    pass, so no intermediate [B,H,W,3] buffer materializes).
  * fused_bce_with_logits_masked — multi-label weighted BCE + class-mask
    reduction in one pass over [B, C] (custom VJP; saves the [B, C]
    elementwise loss materialization of the torch path,
    utils/local_training.py:664-665).

On non-TPU backends both fall back to the pure-jnp formulation so tests
run anywhere (`interpret=True` is used under pytest's CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FILL_GRAY = 127.0


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ----------------------------------------------------------------------
# Fused normalize + hflip + cutout
# ----------------------------------------------------------------------

def _norm_kernel(img_ref, flip_ref, box_ref, ms_ref, out_ref):
    """One image [H, W, C]: out = ((maybe-flipped, maybe-cutout x) - m)/s.

    flip_ref: (1,1) int32 SMEM; box_ref: (1,4) int32 SMEM (x0,y0,x1,y1);
    ms_ref: (2, C) f32 SMEM — row 0 = mean·255, row 1 = std·255."""
    x = img_ref[:].astype(jnp.float32)
    H, W, C = x.shape
    flip = flip_ref[0, 0]
    x = jnp.where(flip > 0, x[:, ::-1, :], x)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    x0, y0, x1, y1 = box_ref[0, 0], box_ref[0, 1], box_ref[0, 2], box_ref[0, 3]
    inside = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)
    x = jnp.where(inside[:, :, None], FILL_GRAY, x)
    out = x
    # per-channel normalize with SMEM scalars (avoids captured constants)
    chans = [
        (out[:, :, c] - ms_ref[0, c]) / ms_ref[1, c] for c in range(C)
    ]
    out_ref[:] = jnp.stack(chans, axis=-1)


def fused_normalize_flip_cutout(images_u8, flips, boxes, mean, std,
                                interpret: bool | None = None):
    """images_u8 [B, H, W, 3]; flips [B] int32; boxes [B, 4] int32
    (x0,y0,x1,y1 — pass zeros to disable cutout). Returns f32 normalized."""
    if interpret is None:
        interpret = not _on_tpu()
    B, H, W, C = images_u8.shape
    ms = jnp.stack(
        [jnp.asarray(mean, jnp.float32) * 255.0,
         jnp.asarray(std, jnp.float32) * 255.0]
    )

    call = pl.pallas_call(
        _norm_kernel,
        out_shape=jax.ShapeDtypeStruct((H, W, C), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), memory_space=pltpu.SMEM),
            pl.BlockSpec((2, C), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            memory_space=pl.ANY if interpret else pltpu.VMEM
        ),
        interpret=interpret,
    )

    def one(img, flip, box):
        return call(img, flip.reshape(1, 1), box.reshape(1, 4), ms)

    return jax.vmap(one)(images_u8, flips.astype(jnp.int32),
                         boxes.astype(jnp.int32))


def reference_normalize_flip_cutout(images_u8, flips, boxes, mean, std):
    """Pure-jnp reference used for parity tests and non-TPU fallback."""
    x = images_u8.astype(jnp.float32)
    B, H, W, C = x.shape
    x = jnp.where(flips[:, None, None, None] > 0, x[:, :, ::-1, :], x)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)[None]
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)[None]
    x0, y0 = boxes[:, 0, None, None], boxes[:, 1, None, None]
    x1, y1 = boxes[:, 2, None, None], boxes[:, 3, None, None]
    inside = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)
    x = jnp.where(inside[..., None], FILL_GRAY, x)
    m = jnp.asarray(mean, jnp.float32) * 255.0
    s = jnp.asarray(std, jnp.float32) * 255.0
    return (x - m) / s


# ----------------------------------------------------------------------
# Fused weighted BCE-with-logits + class-mask reduction (custom VJP)
# ----------------------------------------------------------------------

def _bce_fwd_kernel(logits_ref, labels_ref, posw_ref, mask_ref, out_ref):
    """Σ_{b,c} mask[b,c] · (-posw_c·y·logσ(x) − (1−y)·log σ(−x)) → (1,1)."""
    x = logits_ref[:].astype(jnp.float32)
    y = labels_ref[:].astype(jnp.float32)
    pw = posw_ref[:].astype(jnp.float32)
    m = mask_ref[:].astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(x)
    log_np = jax.nn.log_sigmoid(-x)
    elem = -(pw * y * log_p + (1.0 - y) * log_np)
    out_ref[0, 0] = (elem * m).sum()


def _bce_sum(logits, labels, pos_weight, mask, interpret):
    call = pl.pallas_call(
        _bce_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)
        ] * 4,
        out_specs=pl.BlockSpec(
            memory_space=pl.ANY if interpret else pltpu.SMEM
        ),
        interpret=interpret,
    )
    return call(logits, labels, jnp.broadcast_to(pos_weight, logits.shape),
                jnp.broadcast_to(mask, logits.shape))[0, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_bce_with_logits_masked(logits, labels, pos_weight, mask,
                                 interpret=False):
    """Masked sum of weighted BCE-with-logits in one fused pass.

    Equivalent to (bce_with_logits(logits, labels, pos_weight) * mask).sum()
    without materializing the [B, C] loss tensor."""
    return _bce_sum(logits, labels, pos_weight, mask, interpret)


def _fused_bce_fwd(logits, labels, pos_weight, mask, interpret):
    out = _bce_sum(logits, labels, pos_weight, mask, interpret)
    return out, (logits, labels, pos_weight, mask)


def _fused_bce_bwd(interpret, res, g):
    logits, labels, pos_weight, mask = (jnp.asarray(r) for r in res)
    p = jax.nn.sigmoid(logits)
    # d/dx [-pw·y·logσ − (1−y)·log(1−σ)] = −pw·y·(1−p) + (1−y)·p
    grad = (-pos_weight * labels * (1.0 - p) + (1.0 - labels) * p) * mask
    return (g * grad, None, None, None)


fused_bce_with_logits_masked.defvjp(_fused_bce_fwd, _fused_bce_bwd)
