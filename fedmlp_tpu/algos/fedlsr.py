"""FedLSR (label-smoothing regularization).

Local step (reference: utils/local_training.py:1270-1326): two weak views;
temperature-sharpened sigmoids (T=1/3, i.e. logits·3) clamped to
[1e-6, 1]; predictions mixed through inverse-sigmoid space with
Beta(1,1)=U(0,1) weights, re-sharpened at ·2; loss:
    BCEWithLogits_w(pred_mix, y) mean      (note: pred_mix is a probability
                                            fed into a with-logits loss —
                                            faithful to the reference)
  + β·JS(sharp1, sharp2),  β = 0.4·min(rnd/t_w, 1)

Server: FedAvg.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fedmlp_tpu.algos.base import apply_train
from fedmlp_tpu.ops import losses as L

VIEW_MODE = "dual"
NEEDS_GLOBAL = False


def loss_fn(params, rest, model, views, sample, svalid, ctx, cstate, rng, scalars):
    labels = sample["labels"]
    _, l1, rest1 = apply_train(model, params, rest, views["x1"], rng)
    _, l2, rest2 = apply_train(model, params, rest1, views["x2"], jax.random.fold_in(rng, 1))
    C = l1.shape[1]

    mix1 = jax.random.uniform(rng)  # np.random.beta(1, 1) ≡ U(0, 1)
    mix2 = 1.0 - mix1
    sharp1 = jnp.clip(jax.nn.sigmoid(l1 * 3.0), 1e-6, 1.0)
    sharp2 = jnp.clip(jax.nn.sigmoid(l2 * 3.0), 1e-6, 1.0)
    p = jax.nn.sigmoid(l1) * mix1 + jax.nn.sigmoid(l2) * mix2
    pred_mix = jax.nn.sigmoid(L.anti_sigmoid(p) * 2.0)

    beta = scalars["beta"]
    elem = L.bce_with_logits(pred_mix, labels, ctx["loss_w"])
    sv = svalid.astype(elem.dtype)[:, None]
    # torch reduction='mean' over the actual batch
    loss = (elem * sv).sum() / jnp.maximum(sv.sum() * C, 1.0)
    loss = loss + L.js_divergence(sharp1, sharp2) * beta
    return loss, (rest2, {})


def round_scalars(trainer, rnd):
    t_w = trainer.cfg.fedlsr.t_w
    beta = 0.4 * rnd / t_w if rnd < t_w else 0.4
    return {"beta": jnp.float32(beta)}
