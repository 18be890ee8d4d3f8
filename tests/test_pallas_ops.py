"""Pallas kernels vs pure-jnp references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fedmlp_tpu.ops import losses as L
from fedmlp_tpu.ops.pallas_ops import (
    fused_bce_with_logits_masked,
    fused_normalize_flip_cutout,
    reference_normalize_flip_cutout,
)

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def test_fused_normalize_matches_reference(rng):
    imgs = rng.randint(0, 255, (4, 32, 32, 3)).astype(np.uint8)
    flips = np.array([0, 1, 0, 1], np.int32)
    boxes = np.array(
        [[0, 0, 0, 0], [4, 4, 12, 12], [0, 0, 32, 32], [30, 30, 32, 32]],
        np.int32,
    )
    got = np.asarray(
        fused_normalize_flip_cutout(imgs, flips, boxes, MEAN, STD, interpret=True)
    )
    want = np.asarray(
        reference_normalize_flip_cutout(
            jnp.asarray(imgs), jnp.asarray(flips), jnp.asarray(boxes), MEAN, STD
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_fused_bce_matches_composition(rng):
    logits = rng.randn(8, 5).astype(np.float32)
    labels = (rng.rand(8, 5) < 0.4).astype(np.float32)
    posw = rng.uniform(0.5, 4.0, 5).astype(np.float32)
    mask = (rng.rand(8, 5) < 0.7).astype(np.float32)
    got = float(
        fused_bce_with_logits_masked(logits, labels, posw, mask, True)
    )
    want = float((np.asarray(L.bce_with_logits(logits, labels, posw)) * mask).sum())
    assert got == pytest.approx(want, rel=1e-5)


def test_fused_bce_gradient(rng):
    logits = rng.randn(6, 4).astype(np.float32)
    labels = (rng.rand(6, 4) < 0.5).astype(np.float32)
    posw = rng.uniform(0.5, 4.0, 4).astype(np.float32)
    mask = np.ones((6, 4), np.float32)

    g_fused = jax.grad(
        lambda x: fused_bce_with_logits_masked(x, labels, posw, mask, True)
    )(logits)
    g_ref = jax.grad(
        lambda x: (L.bce_with_logits(x, labels, posw) * mask).sum()
    )(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)
