"""Shared helpers for algorithm loss functions."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_train(model, params, rest, x):
    """Train-mode forward with BN running-stat update.

    Returns (feature, logits, new_rest). ``rest`` holds the non-param
    variable collections ({'batch_stats': ...})."""
    variables = {"params": params, **rest}
    (feature, logits), mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    new_rest = dict(rest)
    new_rest.update(mutated)
    return feature, logits, new_rest


def apply_eval(model, variables, x):
    feature, logits = model.apply(variables, x, train=False)
    return feature, logits


def masked_rows(loss_elem, svalid):
    """Zero out padding samples of a ragged batch; loss_elem [B, C]."""
    return loss_elem * svalid.astype(loss_elem.dtype)[:, None]
