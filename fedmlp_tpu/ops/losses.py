"""Loss / criterion library.

Pure-JAX re-implementations of every criterion in the reference, written
mask-first: where the reference slices Python lists of class indices
(e.g. ``loss[:, active_class_list_client]``), these take a boolean class mask
so the whole client population can be batched on a leading axis under vmap.

Reference criteria covered:
  * weighted BCE-with-logits (pos_weight)      — utils/local_training.py:642
  * BCE on probabilities (LogitAdjust_Multilabel) — utils/FedNoRo.py:9-22
  * LA_KD                                       — utils/FedNoRo.py:25-38
  * sigmoid MSE consistency                     — utils/local_training.py:94-107
  * symmetric-KL relation loss (kd_loss)        — utils/local_training.py:109-113
  * Jensen-Shannon between sharpened views (js) — utils/local_training.py:1258-1266
  * RoFL composite (RFLloss)                    — utils/local_training.py:582-613
  * sigmoid rampups                             — utils/local_training.py:83-92,
                                                   utils/FedNoRo.py:72-81
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-6
# torch.nn.functional.binary_cross_entropy clamps each log term at -100.
_LOG_CLAMP = -100.0


def bce_with_logits(logits, targets, pos_weight=None):
    """Elementwise BCE with logits, torch BCEWithLogitsLoss(reduction='none')
    semantics: loss = -(pos_w * y * log σ(x) + (1-y) * log(1-σ(x)))."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    pw = 1.0 if pos_weight is None else pos_weight
    return -(pw * targets * log_p + (1.0 - targets) * log_not_p)


@jax.custom_vjp
def _bce_on_probs_core(probs, targets):
    log_p = jnp.maximum(jnp.log(probs), _LOG_CLAMP)
    log_not_p = jnp.maximum(jnp.log(1.0 - probs), _LOG_CLAMP)
    return -(targets * log_p + (1.0 - targets) * log_not_p)


def _bce_core_fwd(probs, targets):
    return _bce_on_probs_core(probs, targets), (probs, targets)


def _bce_core_bwd(res, g):
    # torch binary_cross_entropy_backward: (p - y) / max(p·(1-p), 1e-12).
    # Autodiff through the -100 log clamp is NOT safe: at p ∈ {0, 1} exactly
    # (sigmoid saturates at |logit| ≳ 16.6 in f32) the chain rule evaluates
    # 0 · ∞ = NaN, which poisoned long local epochs (290-step FedMLP stage-1
    # rounds NaN'd at the first saturated logit). Torch's formula is finite
    # everywhere, and composed with sigmoid's backward (× p·(1-p)) the
    # saturated-logit gradient is exactly 0 — verified against torch 2.x.
    p, y = res
    denom = jnp.maximum(p * (1.0 - p), 1e-12)
    dp = g * (p - y) / denom
    dy = g * (jnp.maximum(jnp.log(1.0 - p), _LOG_CLAMP)
              - jnp.maximum(jnp.log(p), _LOG_CLAMP))
    return dp, dy


_bce_on_probs_core.defvjp(_bce_core_fwd, _bce_core_bwd)


def bce_on_probs(probs, targets, weight=None):
    """Elementwise BCE on probabilities, torch F.binary_cross_entropy
    semantics incl. the -100 log clamp (reference: utils/FedNoRo.py:22) and
    torch's saturation-safe backward (see ``_bce_core_bwd``)."""
    loss = _bce_on_probs_core(probs, targets)
    if weight is not None:
        loss = loss * weight
    return loss


def masked_class_mean(loss, class_mask, batch_size=None):
    """Reference pattern ``loss[:, cls_list].sum() / (batch * len(cls_list))``
    as a mask-weighted mean. ``class_mask`` is [C] (or broadcastable bool);
    ``batch_size`` defaults to the actual leading dim — the reference divides
    by the *configured* batch size even for ragged last batches (e.g.
    utils/local_training.py:956-957), so pass it explicitly for parity."""
    class_mask = class_mask.astype(loss.dtype)
    b = loss.shape[0] if batch_size is None else batch_size
    denom = b * jnp.maximum(class_mask.sum(), 1.0)
    return (loss * class_mask[None, :]).sum() / denom


def la_kd(probs, targets, soft_targets, w_kd, active_mask, negative_mask,
          batch_size=None):
    """FedNoRo LA_KD (reference: utils/FedNoRo.py:35-38):
    (1-w)·BCE(probs, y) over active classes + w·MSE(probs, soft) over missing."""
    bce = masked_class_mean(bce_on_probs(probs, targets), active_mask, batch_size)
    kl = masked_class_mean((probs - soft_targets) ** 2, negative_mask, batch_size)
    return w_kd * kl + (1.0 - w_kd) * bce


def sigmoid_mse(input_logits, target_logits):
    """(σ(a) - σ(b))² elementwise (reference: utils/local_training.py:94-107)."""
    return (jax.nn.sigmoid(input_logits) - jax.nn.sigmoid(target_logits)) ** 2


def kd_symmetric_kl(source, target):
    """Symmetric KL with torch 'batchmean' semantics: sum over elements /
    batch dim (reference: utils/local_training.py:109-113)."""
    q = jnp.clip(source, _EPS, None)
    p = jnp.clip(target, _EPS, None)
    b = source.shape[0]
    kl_qp = (p * (jnp.log(p) - jnp.log(q))).sum() / b
    kl_pq = (q * (jnp.log(q) - jnp.log(p))).sum() / b
    return (kl_qp + kl_pq) / 2.0


def js_divergence(p_output, q_output):
    """Jensen-Shannon with torch KLDivLoss(reduction='mean') semantics —
    mean over ALL elements (reference: utils/local_training.py:1258-1266)."""
    m = (p_output + q_output) / 2.0
    log_m = jnp.log(jnp.clip(m, _EPS, None))
    n = p_output.size
    kl_mp = (p_output * (jnp.log(jnp.clip(p_output, _EPS, None)) - log_m)).sum() / n
    kl_mq = (q_output * (jnp.log(jnp.clip(q_output, _EPS, None)) - log_m)).sum() / n
    return (kl_mp + kl_mq) / 2.0


def anti_sigmoid(p):
    """Inverse sigmoid (reference: utils/local_training.py:1268-1269)."""
    return jnp.log(p / (1.0 - p))


def binary_entropy_per_class(probs):
    """-Σ_{b∈{p,1-p}} b log b, per element (RoFL L_e inner term,
    reference: utils/local_training.py:595-601)."""
    p = jnp.clip(probs, _EPS, 1.0 - _EPS)
    return -(p * jnp.log(p) + (1.0 - p) * jnp.log(1.0 - p))


# ----------------------------------------------------------------------
# Rampups (host-side scalars; pure numpy so they stay out of the jit cache)
# ----------------------------------------------------------------------

def sigmoid_rampup(current: float, rampup_length: float) -> float:
    """exp(-5(1-t)²) rampup (reference: utils/local_training.py:83-90)."""
    if rampup_length == 0:
        return 1.0
    current = float(np.clip(current, 0.0, rampup_length))
    phase = 1.0 - current / rampup_length
    return float(np.exp(-5.0 * phase * phase))


def sigmoid_rampup_bounded(current: float, begin: float, end: float) -> float:
    """FedNoRo variant with [begin, end] clipping
    (reference: utils/FedNoRo.py:72-81)."""
    current = float(np.clip(current, begin, end))
    phase = 1.0 - (current - begin) / (end - begin)
    return float(np.exp(-5.0 * phase * phase))


def pos_weight_from_counts(n_local: float, class_counts: np.ndarray) -> np.ndarray:
    """Inverse class frequency pos_weight (reference:
    utils/local_training.py:40 — loss_w = N_local / class_count)."""
    counts = np.maximum(np.asarray(class_counts, dtype=np.float64), 1e-12)
    return (n_local / counts).astype(np.float32)
