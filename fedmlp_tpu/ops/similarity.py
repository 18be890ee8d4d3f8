"""Prototype / similarity math for FedMLP stage 2 and RoFL.

The reference computes cosine similarity through a matmul + outer norm
product (CosineSimilarityFast, reference: utils/local_training.py:1417-1435);
here the same formulation maps directly onto the MXU: features [N, D] against
a stacked prototype matrix [P, D] in one dot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def cosine_similarity_matrix(x, protos):
    """cos-sim of every row of x [N, D] against every row of protos [P, D]
    → [N, P]. Matches CosineSimilarityFast up to fp assoc."""
    dots = jnp.dot(x, protos.T, preferred_element_type=jnp.float32)
    xn = jnp.linalg.norm(x, axis=1, keepdims=True)
    pn = jnp.linalg.norm(protos, axis=1, keepdims=True)
    return dots / jnp.maximum(xn * pn.T, _EPS)


def fedmlp_similarity_scores(features, prototypes):
    """Per-class clean-vs-noise score: cos(f, proto_0_c) - cos(f, proto_1_c)
    (reference: utils/local_training.py:1052-1058). ``prototypes`` is
    [2C, D] laid out [cls0_p0, cls0_p1, cls1_p0, ...]; returns [N, C] where
    score >= 0 → candidate clean (true negative), < 0 → candidate noise
    (hidden positive)."""
    sims = cosine_similarity_matrix(features, prototypes)  # [N, 2C]
    return sims[:, 0::2] - sims[:, 1::2]


def masked_binary_prototypes(features, labels, sample_mask, n_classes):
    """Per-class binary feature prototypes: mean penultimate feature over
    label==0 and label==1 samples (reference: utils/local_training.py:
    985-999). Returns (proto [2C, D], counts [2C]). Classes with zero
    members keep a zero prototype (reference keeps the running zero sum,
    utils/local_training.py:1240-1248)."""
    f32 = features.astype(jnp.float32)
    m = sample_mask.astype(jnp.float32)[:, None]  # [N, 1]
    lab = labels.astype(jnp.float32)  # [N, C]
    # weights [N, 2C]: w0 = valid * (1 - y), w1 = valid * y interleaved
    w1 = m * lab
    w0 = m * (1.0 - lab)
    w = jnp.stack([w0, w1], axis=2).reshape(f32.shape[0], 2 * n_classes)
    sums = jnp.dot(w.T, f32, preferred_element_type=jnp.float32)  # [2C, D]
    counts = w.sum(axis=0)  # [2C]
    proto = sums / jnp.maximum(counts[:, None], 1.0)
    proto = jnp.where(counts[:, None] > 0, proto, 0.0)
    return proto, counts


def confidence_fraction(probs, sample_mask, L, U):
    """Per-class fraction of samples with prob < L or prob > U
    (reference: utils/local_training.py:994-1000). Returns [C] with the
    denominator = number of valid samples."""
    m = sample_mask.astype(jnp.float32)[:, None]
    confident = jnp.logical_or(probs < L, probs > U).astype(jnp.float32)
    n = jnp.maximum(sample_mask.sum(), 1.0)
    return (confident * m).sum(axis=0) / n


def rofl_centroid_update(f_k, f_kj_hat):
    """RoFL EMA by squared cosine similarity (reference:
    utils/local_training.py:569-572)."""
    sim = jax.vmap(
        lambda a, b: jnp.dot(a, b)
        / jnp.maximum(jnp.linalg.norm(a) * jnp.linalg.norm(b), _EPS)
    )(f_k, f_kj_hat)
    s2 = (sim ** 2)[:, None]
    return (1.0 - s2) * f_k + s2 * f_kj_hat
