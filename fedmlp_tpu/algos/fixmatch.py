"""FedAVG+FixMatch.

Local step (reference: utils/local_training.py:771-825): weak view
supervises active classes; samples whose weak sigmoid is confident
(>0.8 or <0.2) on EVERY missing class get hard pseudo-labels (threshold
0.5) that supervise the strong (RandAugmentMC) view on missing classes:
    loss_sup   = BCE_w(logits_weak, y)[:, active].sum()/(B·|active|)
    loss_unsup = BCE_w_unknown(logits_strong, hard(σ(weak)))
                    [conf, missing].sum()/(n_conf·|missing|)
    loss = loss_sup (+ loss_unsup when n_conf>0 and missing classes exist)

Server: FedAvg.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fedmlp_tpu.algos.base import apply_train, masked_rows
from fedmlp_tpu.ops import losses as L

VIEW_MODE = "weak_strong"
NEEDS_GLOBAL = False


def loss_fn(params, rest, model, views, sample, svalid, ctx, cstate, rng, scalars):
    labels = sample["labels"]
    _, logits_weak, rest1 = apply_train(model, params, rest, views["x1"], rng)
    _, logits_strong, rest2 = apply_train(model, params, rest1, views["x2"], jax.random.fold_in(rng, 1))
    B = logits_weak.shape[0]
    active, negative = ctx["active"], ctx["negative"]

    p_weak = jax.lax.stop_gradient(jax.nn.sigmoid(logits_weak))
    conf_per_class = jnp.logical_or(p_weak > 0.8, p_weak < 0.2)
    # confident on ALL missing classes (set intersection, reference :800-803)
    conf = jnp.all(
        jnp.logical_or(conf_per_class, active[None, :] > 0), axis=1
    ).astype(jnp.float32) * svalid.astype(jnp.float32)
    hard = (p_weak > 0.5).astype(jnp.float32)

    sup = masked_rows(L.bce_with_logits(logits_weak, labels, ctx["loss_w"]), svalid)
    loss_sup = (sup * active[None, :]).sum() / (B * jnp.maximum(active.sum(), 1.0))

    unsup = L.bce_with_logits(logits_strong, hard, ctx["loss_w_unknown"])
    n_conf = conf.sum()
    n_neg = negative.sum()
    loss_unsup = (unsup * conf[:, None] * negative[None, :]).sum() / jnp.maximum(
        n_conf * n_neg, 1.0
    )
    use_unsup = jnp.logical_and(n_conf > 0, n_neg > 0)
    loss = jnp.where(use_unsup, loss_sup + loss_unsup, loss_sup)
    return loss, (rest2, {})
