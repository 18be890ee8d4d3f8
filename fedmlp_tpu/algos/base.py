"""Shared helpers for algorithm loss functions."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_train(model, params, rest, x, rng=None):
    """Train-mode forward with BN running-stat update.

    Returns (feature, logits, new_rest). ``rest`` holds the non-param
    variable collections ({'batch_stats': ...}). ``rng`` seeds stochastic
    layers (SENet-154 / EfficientNet dropout); models without dropout
    ignore it."""
    variables = {"params": params, **rest}
    rngs = {"dropout": rng} if rng is not None else None
    (feature, logits), mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"], rngs=rngs
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
