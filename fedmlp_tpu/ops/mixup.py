"""Mixup utilities (FedMLP ablation path).

The reference implements mixup in two places, both gated behind ablation
flags and unused by main.py (SURVEY.md §2.2):
  * DatasetSplit_Mixup — mixes pairs of clean or noise samples with
    Beta(1,1) weights (utils/local_training.py:1365-1415);
  * mixup_criterion — loss interpolation (utils/local_training.py:827-828).

Device-side equivalents: mixup happens on the gathered batch inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mixup_images(images, key, alpha: float = 1.0):
    """Mix each sample with a random partner from the same batch.

    Returns (mixed_images, perm, lam) so the caller can permute labels AND
    masks consistently. Beta(1,1) ≡ U(0,1) as the reference draws
    (utils/local_training.py:1408-1415)."""
    k1, k2 = jax.random.split(key)
    B = images.shape[0]
    lam = (jax.random.beta(k1, alpha, alpha).astype(images.dtype)
           if alpha > 0 else jnp.asarray(1.0, images.dtype))
    perm = jax.random.permutation(k2, B)
    mixed = lam * images + (1.0 - lam) * images[perm]
    return mixed, perm, lam


def mixup_batch(images, targets, key, alpha: float = 1.0):
    """Convenience wrapper returning (mixed_images, targets_a, targets_b,
    lam) — the reference's DatasetSplit_Mixup return contract
    (utils/local_training.py:1388-1406)."""
    mixed, perm, lam = mixup_images(images, key, alpha)
    return mixed, targets, targets[perm], lam


def mixup_criterion(loss_fn, pred, y_a, y_b, lam):
    """lam·L(pred, y_a) + (1−lam)·L(pred, y_b)
    (reference: utils/local_training.py:827-828)."""
    return lam * loss_fn(pred, y_a) + (1.0 - lam) * loss_fn(pred, y_b)
