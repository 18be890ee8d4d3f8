"""FedNoRo (noisy-label FL).

Local warm-up step (reference: utils/local_training.py:115-161, the only
branch main.py wires — rounds_FedNoRo_warmup defaults to all rounds,
main.py:140-144): student = arriving global, teacher = frozen copy of the
same; loss = LA_KD (utils/FedNoRo.py:25-38):
    (1-w_kd)·BCE(σ(logits), y) over active classes
  +    w_kd ·MSE(σ(logits), σ(teacher_logits / 0.8)) over missing classes
with w_kd = sigmoid_rampup_bounded(rnd, begin, end) · a (main.py:128).

Server: plain FedAvg (main.py:269-272). The post-warmup clean/noisy client
split (GMM detection + DaAgg, utils/FedNoRo.py:84-103) exists in the
reference but is never invoked by main.py; DaAgg is available in
fedmlp_tpu.fl for completeness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fedmlp_tpu.algos.base import apply_train, masked_rows
from fedmlp_tpu.ops import losses as L

VIEW_MODE = "single"
NEEDS_GLOBAL = True


def loss_fn(params, rest, model, views, sample, svalid, ctx, cstate, rng, scalars):
    labels = sample["labels"]
    _, logits, new_rest = apply_train(model, params, rest, views["x"], rng)
    probs = jax.nn.sigmoid(logits)
    soft = jax.nn.sigmoid(views["g_logits"] / 0.8)  # teacher temperature
    B, C = logits.shape

    bce = masked_rows(L.bce_on_probs(probs, labels), svalid)
    mse = masked_rows((probs - soft) ** 2, svalid)
    active, negative = ctx["active"], ctx["negative"]
    bce_m = (bce * active[None, :]).sum() / (B * jnp.maximum(active.sum(), 1.0))
    kl_m = (mse * negative[None, :]).sum() / (B * jnp.maximum(negative.sum(), 1.0))
    w = scalars["weight_kd"]
    loss_kd = w * kl_m + (1.0 - w) * bce_m

    # post-warm-up: clean clients drop the teacher and train plain BCE over
    # the full matrix (reference :162-190); noisy clients keep LA_KD
    # (:191-231). The same student forward feeds both; the scalar select
    # dispatches per client.
    loss_clean = bce.sum() / (B * C)
    post = scalars.get("post_warmup", jnp.float32(0.0))
    noisy = ctx.get("noisy_flag", jnp.float32(1.0))
    loss = jnp.where(
        post > 0, jnp.where(noisy > 0, loss_kd, loss_clean), loss_kd
    )
    return loss, (new_rest, {})


def round_scalars(trainer, rnd):
    cfg = trainer.cfg.fednoro
    w = L.sigmoid_rampup_bounded(rnd, cfg.begin, cfg.end) * cfg.a
    return {
        "weight_kd": jnp.float32(w),
        "post_warmup": jnp.float32(1.0 if rnd >= cfg.rounds_warmup else 0.0),
    }


def extra_ctx(trainer):
    """Per-client noisy flags from the last GMM split (1.0 until a split
    has been made — every client keeps the KD loss pre-warm-up)."""
    import numpy as np

    noisy = trainer.server_state.get("noisy") if trainer.server_state else None
    flags = np.ones((trainer.n_clients,), np.float32)
    if noisy:
        flags[:] = 0.0
        flags[list(noisy)] = 1.0
    return {"noisy_flag": jnp.asarray(flags)}


# ----------------------------------------------------------------------
# Post-warm-up: clean-client CE branch (reference :162-190), noisy-client
# LA_KD branch (:191-231), GMM clean/noisy split + DaAgg aggregation.
# ----------------------------------------------------------------------

def init_server_state(trainer):
    return {"clean": None, "noisy": None}


def server_update(trainer, rnd, svars, server_state):
    """FedAvg during warm-up (main.py:269-272); after rounds_warmup, split
    clients clean/noisy via a GMM over their mean losses and aggregate with
    DaAgg (utils/FedNoRo.py:84-103) — the full-pipeline path main.py leaves
    unwired."""
    import numpy as np

    from fedmlp_tpu.algos.detection import split_clean_noisy_gmm
    from fedmlp_tpu.fl import daagg

    cfg = trainer.cfg.fednoro
    if rnd < cfg.rounds_warmup:
        return trainer.aggregate(svars, trainer.dict_len), server_state
    losses = np.asarray(trainer.history[-1].client_losses) if trainer.history \
        else np.zeros(trainer.n_clients)
    clean, noisy = split_clean_noisy_gmm(losses, trainer.cfg.seed)
    server_state = dict(server_state, clean=clean, noisy=noisy)
    if not noisy:
        return trainer.aggregate(svars, trainer.dict_len), server_state
    # jit per (clean, noisy) split — the lists are static in the graph
    daagg_jit = jax.jit(
        lambda sv: daagg(sv, trainer.dict_len, clean, noisy)
    )
    return daagg_jit(svars), server_state
