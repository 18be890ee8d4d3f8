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
