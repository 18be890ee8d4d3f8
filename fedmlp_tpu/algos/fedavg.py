"""FedAVG baseline.

Local step (reference ``LocalUpdate.train``, utils/local_training.py:628-703):
weighted BCEWithLogits(pos_weight=loss_w) over ALL classes — missing labels
are treated as true negatives — normalized by (batch_size · n_classes).
Server: dataset-size FedAvg (reference: main.py:317-319).
"""

from __future__ import annotations

import jax.numpy as jnp

from fedmlp_tpu.algos.base import apply_train, masked_rows
from fedmlp_tpu.ops import losses as L

VIEW_MODE = "single"
NEEDS_GLOBAL = False


def loss_fn(params, rest, model, views, sample, svalid, ctx, cstate, rng, scalars):
    labels = sample["labels"]
    _, logits, new_rest = apply_train(model, params, rest, views["x"], rng)
    elem = L.bce_with_logits(logits, labels, ctx["loss_w"])
    elem = masked_rows(elem, svalid)
    B, C = logits.shape
    loss = elem.sum() / (B * C)  # reference: loss.sum()/(batch*n_classes)
    return loss, (new_rest, {})


def stacked_loss_fn(params, rest, model, views, sample, svalid, ctx, rng,
                    scalars):
    """Channel-stacked variant: all K clients in one forward
    (parallel/fl_runtime.py::make_stacked_local_round). Same math as
    ``loss_fn``, with the [K] client axis kept throughout."""
    from fedmlp_tpu.models.stacked import stacked_apply

    labels = sample["labels"]  # [K, B, C]
    (_, logits), new_stats = stacked_apply(
        model, {"params": params, **rest}, views["x"], train=True, rng=rng)
    elem = L.bce_with_logits(logits, labels, ctx["loss_w"][:, None, :])
    elem = elem * svalid.astype(elem.dtype)[..., None]
    K, B, C = logits.shape
    loss_k = elem.sum(axis=(1, 2)) / (B * C)
    new_rest = dict(rest)
    if new_stats is not None:
        new_rest["batch_stats"] = new_stats
    return loss_k.sum(), (new_rest, loss_k)
