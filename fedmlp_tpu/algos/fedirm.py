"""FedIRM (inter-client relation matching, MICCAI 2021).

Supervised phase (rnd < rounds_FedIRM_sup, reference:
utils/local_training.py:344-390): BCE_w on both weak views over active
classes; at the last supervised round each client reports its relation
("confusion") matrix — class-conditional mean logits, sigmoid-sharpened at
T=2 (get_confuse_matrix, :73-81) — averaged over all batches.

Relation phase (:392-464): per-step EMA teacher over params
(update_ema_variables, :62-65, α = min(1−1/(it+1), ema_decay)); samples
pass an uncertainty filter (entropy < 2.0) AND a confidence filter (every
class prob >0.7 or <0.3); their hard pseudo-labels build the local source
relation matrix (0.5-filled when no sample passes); loss:
    cw·Σ sigmoid_mse(outputs, ema_outputs)/B
  + cw·sym-KL(source, target-relation)
  + supervised BCE on both views (active classes)
with cw = consistency·sigmoid_rampup(rnd, rampup) (:91-92).

Server (main.py:238-252): FedAvg; relation matrix aggregated per class
over annotating clients (FedAvg_rela), λ=1 replacement.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from fedmlp_tpu.algos.base import apply_train, masked_rows
from fedmlp_tpu.fl import fedavg_rela
from fedmlp_tpu.ops import losses as L
from fedmlp_tpu.parallel import fl_runtime as rt

VIEW_MODE = "dual"
NEEDS_GLOBAL = False


def _confuse_matrix(logits, labels, sample_w):
    """get_confuse_matrix generalized to C classes with sample weights
    (reference: utils/local_training.py:73-81): row i = σ(mean logits over
    samples positive for class i / 2)."""
    w = labels * sample_w[:, None]  # [B, C]
    sums = jnp.dot(w.T, logits, preferred_element_type=jnp.float32)  # [C, C]
    counts = w.sum(0)[:, None]
    return jax.nn.sigmoid(sums / (counts + 1e-8) / 2.0)


def sup_loss_fn(params, rest, model, views, sample, svalid, ctx, cstate,
                rng, scalars):
    labels = sample["labels"]
    _, l1, rest1 = apply_train(model, params, rest, views["x1"], rng)
    _, l2, rest2 = apply_train(model, params, rest1, views["x2"], jax.random.fold_in(rng, 1))
    B = l1.shape[0]
    active = ctx["active"]
    sup = masked_rows(
        L.bce_with_logits(l1, labels, ctx["loss_w"])
        + L.bce_with_logits(l2, labels, ctx["loss_w"]),
        svalid,
    )
    loss = (sup * active[None, :]).sum() / (B * jnp.maximum(active.sum(), 1.0))
    cm = _confuse_matrix(l1, labels, svalid.astype(jnp.float32))
    return loss, (rest2, {"confusion": cm, "steps": jnp.float32(1.0)})


loss_fn = sup_loss_fn  # default round_fn (supervised phase)


def relation_loss_fn(params, rest, model, views, sample, svalid, ctx, cstate,
                     rng, scalars):
    labels = sample["labels"]
    target_matrix = scalars["target_matrix"]
    cw = scalars["consistency_weight"]
    _, outputs, rest1 = apply_train(model, params, rest, views["x1"], rng)
    _, l2, rest2 = apply_train(model, params, rest1, views["x2"], jax.random.fold_in(rng, 1))
    ema_output = views["t_logits2"]
    B, C = outputs.shape
    sv = svalid.astype(jnp.float32)

    preds = jax.lax.stop_gradient(jax.nn.sigmoid(outputs))
    uncertainty = L.binary_entropy_per_class(preds).sum(1)
    unc_mask = uncertainty < 2.0
    conf_mask = jnp.all(jnp.logical_or(preds > 0.7, preds < 0.3), axis=1)
    mask = (unc_mask & conf_mask) & (sv > 0)
    pseudo = (preds > 0.5).astype(jnp.float32)
    source = _confuse_matrix(outputs, pseudo, mask.astype(jnp.float32))
    source = jnp.where(mask.sum() > 0, source, 0.5 * jnp.ones_like(source))

    consistency = (masked_rows(L.sigmoid_mse(outputs, ema_output), svalid)).sum() / B
    loss = cw * consistency + cw * L.kd_symmetric_kl(source, target_matrix)
    sup = masked_rows(
        L.bce_with_logits(outputs, labels, ctx["loss_w"])
        + L.bce_with_logits(l2, labels, ctx["loss_w"]),
        svalid,
    )
    active = ctx["active"]
    loss = loss + (sup * active[None, :]).sum() / (
        B * jnp.maximum(active.sum(), 1.0)
    )
    cm = _confuse_matrix(outputs, labels, sv)
    return loss, (rest2, {"confusion": cm, "steps": jnp.float32(1.0)})


def get_persistent(trainer):
    """Checkpoint protocol: the EMA teacher survives resume (otherwise the
    relation phase would silently restart it from the global model)."""
    if hasattr(trainer, "_fedirm_teacher"):
        return {"teacher": trainer._fedirm_teacher}
    return {}


def set_persistent(trainer, state):
    if "teacher" in state:
        trainer._fedirm_teacher = state["teacher"]


def init_server_state(trainer):
    C = trainer.fd.n_classes
    return {"relation": np.full((C, C), 0.5, np.float32), "ema_init": False}


def _get_relation_fn(trainer):
    if not hasattr(trainer, "_fedirm_rel_fn"):
        trainer._fedirm_rel_fn = rt.make_local_round(
            trainer.model, relation_loss_fn,
            lr=trainer.cfg.base_lr, batch_size=trainer.cfg.batch_size,
            mean=trainer.cfg.data.mean, std=trainer.cfg.data.std,
            view_mode="dual",
            teacher_decay=trainer.cfg.fedirm.ema_decay,
            teacher_iter_corrected=True,
            teacher_scope="params",
            mesh=trainer.round_mesh,
            augment_backend=trainer.cfg.data.augment_backend,
            scan_unroll=trainer.cfg.scan_unroll,
            hoist_augment=bool(trainer.cfg.hoist_augment),
            weight_stream_dtype=trainer.weight_stream_dtype,
        )
    return trainer._fedirm_rel_fn


def _aggregate_relation(trainer, confusions):
    act_mask = np.asarray(trainer.fd.active).T  # [C, K]
    trainer.server_state["relation"] = np.asarray(
        fedavg_rela(confusions, trainer.dict_len, act_mask)
    )


def custom_round(trainer, rnd: int):
    cfg = trainer.cfg.fedirm
    st = trainer.server_state
    scalars = trainer.round_scalars(rnd)

    if rnd < cfg.rounds_sup:
        out_state, losses, aux = trainer.local_pass(
            trainer.round_fn, {"labels": trainer.fd.obs_targets}, scalars
        )
        svars = out_state["vars"]
        trainer.global_vars = trainer.aggregate(svars, trainer.dict_len)
        if rnd == cfg.rounds_sup - 1:
            cms = np.asarray(aux["confusion"]) / np.asarray(aux["steps"])[:, None, None]
            _aggregate_relation(trainer, cms)
        return losses

    # relation phase — teacher initialized from the arriving global model
    # at the first relation round (reference :393-396)
    if not st["ema_init"] or not hasattr(trainer, "_fedirm_teacher"):
        trainer._fedirm_teacher = trainer.broadcast(trainer.global_vars)
        st["ema_init"] = True
    scalars["target_matrix"] = jnp.asarray(st["relation"])
    scalars["consistency_weight"] = jnp.float32(
        cfg.consistency * L.sigmoid_rampup(rnd, cfg.consistency_rampup)
    )
    out_state, losses, aux = trainer.local_pass(
        _get_relation_fn(trainer), {"labels": trainer.fd.obs_targets}, scalars,
        extra_state={"teacher": trainer._fedirm_teacher},
    )
    trainer._fedirm_teacher = out_state["teacher"]
    svars = out_state["vars"]
    trainer.global_vars = trainer.aggregate(svars, trainer.dict_len)
    cms = np.asarray(aux["confusion"]) / np.asarray(aux["steps"])[:, None, None]
    _aggregate_relation(trainer, cms)
    return losses
