"""RoFL (robust FL with per-class binary feature centroids).

Reference: utils/local_training.py:466-626 (train_RoFL + RFLloss +
get_small_loss_samples); server aggregation per the (commented) block at
main.py:253-268: FedAvg of weights + cosine-similarity-weighted centroid
aggregation into the global centroid table f_G. main.py keeps the RoFL
dispatch commented out, but the algorithm is fully implemented in the
reference — it is a first-class method here.

Per round (one client):
  1. eval pass over local data: hard global-guided pseudo-labels
     pseudo[item] = 1{σ(logit) > 0.5}; at round 0 the local centroids f_k
     are the naive per-(class, 0/1) feature means, afterwards f_k = f_G
     (:480-510).
  2. per batch: small-loss selection keeps the (1−forget_rate) fraction
     with smallest per-sample BCE (pos_weight = loss_w with missing
     classes forced to 5.0, :615-626); agreement mask m_i = 1 when the
     centroid-nearest binary code equals the observed labels (:526-533);
     before T_pl rounds, selected samples refresh the pseudo table with
     their observed labels (:536-538); training labels are
     m·y + (1−m)·pseudo (:541-544); loss = L_c + λ_cen·L_cen + λ_e·L_e
     (RFLloss, :582-613) with λ_cen ramped by round/T_pl;
     f_k ← EMA by squared cosine sim toward the selected-batch feature
     means (:553-572).

State: cstate = {'f_k' [2C, D], 'pseudo' [M, C]} per client, threaded
through the engine scan; pseudo is indexed by table position.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from fedmlp_tpu.algos.base import apply_train
from fedmlp_tpu.models import feature_dim_of
from fedmlp_tpu.ops import losses as L
from fedmlp_tpu.ops.similarity import rofl_centroid_update
from fedmlp_tpu.parallel import fl_runtime as rt

VIEW_MODE = "single"
NEEDS_GLOBAL = False

_EPS = 1e-12


def _cos(a, b):
    return jnp.dot(a, b) / jnp.maximum(
        jnp.linalg.norm(a) * jnp.linalg.norm(b), _EPS
    )


def loss_fn(params, rest, model, views, sample, svalid, ctx, cstate, rng, scalars):
    labels = sample["labels"]
    f_k = cstate["f_k"]  # [2C, D]
    pseudo_tab = cstate["pseudo"]  # [M, C]
    pos = sample["_pos"]  # [B]
    feature_dim = f_k.shape[1]
    forget_rate = scalars["forget_rate"]
    T_pl = scalars["T_pl"]
    rnd = scalars["rnd"]
    lambda_cen0 = scalars["lambda_cen"]
    lambda_e = scalars["lambda_e"]

    feature, logit, new_rest = apply_train(model, params, rest, views["x"], rng)
    feature = jax.lax.stop_gradient(feature)
    B, C = logit.shape
    sv = svalid.astype(jnp.float32)

    # ---- small-loss selection (:615-626): loss_w with missing classes = 5
    loss_w_sel = jnp.where(ctx["negative"] > 0, 5.0, ctx["loss_w"])
    per_sample = L.bce_with_logits(logit, labels, loss_w_sel).sum(1)
    per_sample = jnp.where(sv > 0, per_sample, jnp.inf)
    n_valid = sv.sum()
    num_remember = jnp.floor((1.0 - forget_rate) * n_valid)
    rank = jnp.argsort(jnp.argsort(per_sample))  # rank of each sample
    sel = (rank < num_remember).astype(jnp.float32) * sv  # [B]

    # ---- centroid agreement mask (:526-533)
    f_pairs = f_k.reshape(C, 2, feature_dim)
    fn = feature / jnp.maximum(
        jnp.linalg.norm(feature, axis=1, keepdims=True), _EPS
    )
    pn = f_pairs / jnp.maximum(
        jnp.linalg.norm(f_pairs, axis=2, keepdims=True), _EPS
    )
    sims = jnp.einsum("bd,ctd->bct", fn, pn)  # [B, C, 2]
    y_tilde = (sims[..., 1] > sims[..., 0]).astype(jnp.float32)  # argmax
    agree = jnp.all(y_tilde == labels, axis=1).astype(jnp.float32) * sel

    pseudo = pseudo_tab[pos]  # [B, C]
    new_labels = agree[:, None] * labels + (1.0 - agree[:, None]) * pseudo

    # ---- RFLloss (:582-613)
    elem = L.bce_with_logits(logit, new_labels, ctx["loss_w"])
    n_sel = jnp.maximum(sel.sum(), 1.0)
    L_c = (elem * sel[:, None]).sum() / (n_sel * C)  # torch mean over sel×C

    # L_cen: per class, MSE(feature, f_k[2c + y_c]) masked by agreement
    y_idx = labels.astype(jnp.int32)  # [B, C] ∈ {0,1}
    cent = jnp.take_along_axis(
        f_pairs[None], y_idx[:, :, None, None], axis=2
    )[:, :, 0]  # [B, C, D]
    se = ((feature[:, None, :] - cent) ** 2).sum(-1)  # [B, C]
    L_cen = (agree[:, None] * se * sel[:, None]).sum(0) / (n_sel * feature_dim)
    L_cen = L_cen.sum() / C

    # L_e: binary entropy of selected samples, per class, averaged
    probs = jax.nn.sigmoid(logit)
    ent = L.binary_entropy_per_class(probs)  # [B, C]
    L_e = ((ent * sel[:, None]).sum(0) / n_sel).sum() / C

    lambda_cen = jnp.where(rnd < T_pl, lambda_cen0 * rnd / T_pl, lambda_cen0)
    loss = L_c + lambda_cen * L_cen + lambda_e * L_e
    aux = {
        "feature": feature,
        "sel": sel,
        # in-training pseudo refresh only before T_pl (reference :536-538)
        "sel_pl": sel * (rnd < T_pl).astype(jnp.float32),
        "agree": agree,
        "labels": labels,
        "new_labels": jax.lax.stop_gradient(new_labels),
    }
    return loss, (new_rest, aux)


def post_step(cstate, aux, sample, svalid, ctx):
    """Per-step centroid EMA + pseudo-table refresh (:536-572)."""
    f_k = cstate["f_k"]
    pseudo = cstate["pseudo"]
    feature, sel, labels = aux["feature"], aux["sel"], aux["labels"]
    C = labels.shape[1]
    D = feature.shape[1]

    # f_kj_hat: selected-batch per-(class, bit) feature means (:553-567)
    w1 = sel[:, None] * labels
    w0 = sel[:, None] * (1.0 - labels)
    w = jnp.stack([w0, w1], axis=2).reshape(-1, 2 * C)  # [B, 2C]
    sums = jnp.dot(w.T, feature, preferred_element_type=jnp.float32)
    counts = jnp.maximum(w.sum(0), 1.0)[:, None]
    f_kj_hat = sums / counts
    new_f_k = rofl_centroid_update(f_k, f_kj_hat)

    # pseudo refresh for selected samples, active only before T_pl
    # (reference :536-538 — sel_pl is pre-masked by the loss)
    sel_pl = aux["sel_pl"]
    pos = sample["_pos"]
    upd = sel_pl[:, None] * labels + (1.0 - sel_pl[:, None]) * pseudo[pos]
    new_pseudo = pseudo.at[pos].set(upd)
    return {"f_k": new_f_k, "pseudo": new_pseudo}


def init_server_state(trainer):
    C = trainer.fd.n_classes
    D = feature_dim_of(trainer.cfg.model)
    rng = np.random.RandomState(trainer.cfg.seed)
    return {
        # f_G initialized ~N(0,1) (main.py:99)
        "f_G": rng.randn(2 * C, D).astype(np.float32),
        "pseudo": np.zeros(
            (trainer.n_clients, trainer.fd.max_local, C), np.float32
        ),
        # forget-rate schedule: linear ramp over num_gradual rounds
        # (main.py:100-104)
        "forget_schedule": _forget_schedule(trainer.cfg),
    }


def _forget_schedule(cfg):
    sched = np.ones(cfg.rounds_warmup) * cfg.rofl.forget_rate
    n = min(cfg.rofl.num_gradual, cfg.rounds_warmup)
    sched[:n] = np.linspace(0, cfg.rofl.forget_rate, n)
    return sched.astype(np.float32)


def _get_round_fn(trainer):
    if not hasattr(trainer, "_rofl_round_fn"):
        trainer._rofl_round_fn = rt.make_local_round(
            trainer.model, loss_fn,
            lr=trainer.cfg.base_lr, batch_size=trainer.cfg.batch_size,
            mean=trainer.cfg.data.mean, std=trainer.cfg.data.std,
            view_mode="single", post_step=post_step,
            mesh=trainer.round_mesh,
            augment_backend=trainer.cfg.data.augment_backend,
            scan_unroll=trainer.cfg.scan_unroll,
            hoist_augment=bool(trainer.cfg.hoist_augment),
            weight_stream_dtype=trainer.weight_stream_dtype,
        )
        trainer._rofl_harvest = rt.make_harvest_fn(
            trainer.model, trainer.cfg.data.mean, trainer.cfg.data.std,
            batch_size=trainer.cfg.batch_size * 4,
            mesh=trainer.round_mesh,
            augment_backend=trainer.cfg.data.augment_backend,
        )
    return trainer._rofl_round_fn


def custom_round(trainer, rnd: int):
    st = trainer.server_state
    cfg = trainer.cfg
    round_fn = _get_round_fn(trainer)
    C = trainer.fd.n_classes

    # 1. eval pass: global-guided pseudo-labels + round-0 centroids
    gstack = trainer.broadcast(trainer.global_vars)
    feats, probs = trainer._rofl_harvest(
        gstack, trainer.fd.images, trainer.fd.idx, trainer.next_key(),
        loader=getattr(trainer, "loader", None),
    )
    # global-guided pseudo labels refreshed EVERY round (reference :480-496;
    # only the in-training label write-back is gated by T_pl)
    st["pseudo"] = np.asarray(probs > 0.5, np.float32)
    if rnd == 0:
        from fedmlp_tpu.ops.similarity import masked_binary_prototypes

        if not hasattr(trainer, "_rofl_proto_jit"):
            trainer._rofl_proto_jit = jax.jit(jax.vmap(
                lambda f, y, v: masked_binary_prototypes(f, y, v, C)[0]
            ))
        f_k0 = np.asarray(trainer._rofl_proto_jit(
            feats, trainer.fd.obs_targets, trainer.fd.valid.astype(jnp.float32)
        ))
    else:
        f_k0 = np.broadcast_to(
            st["f_G"][None], (trainer.n_clients,) + st["f_G"].shape
        ).copy()

    scalars = trainer.round_scalars(rnd)
    scalars.update(
        forget_rate=jnp.float32(st["forget_schedule"][min(rnd, len(st["forget_schedule"]) - 1)]),
        T_pl=jnp.float32(cfg.rofl.T_pl),
        lambda_cen=jnp.float32(cfg.rofl.lambda_cen),
        lambda_e=jnp.float32(cfg.rofl.lambda_e),
    )
    cstate = {
        "f_k": jnp.asarray(f_k0),
        "pseudo": jnp.asarray(st["pseudo"]),
    }
    out_state, losses, _ = trainer.local_pass(
        round_fn, {"labels": trainer.fd.obs_targets}, scalars,
        extra_state={"cstate": cstate},
    )
    svars = out_state["vars"]
    f_locals = np.asarray(out_state["cstate"]["f_k"])  # [K, 2C, D]
    st["pseudo"] = np.asarray(out_state["cstate"]["pseudo"])

    trainer.global_vars = trainer.aggregate(svars, trainer.dict_len)

    # centroid aggregation by cosine similarity to f_G (main.py:256-268)
    f_G = st["f_G"]
    w_sum = np.zeros((2 * C, 1), np.float32)
    tmp = np.zeros_like(f_G)
    for k in range(trainer.n_clients):
        f = f_locals[k]
        sim = (f_G * f).sum(1) / np.maximum(
            np.linalg.norm(f_G, axis=1) * np.linalg.norm(f, axis=1), _EPS
        )
        sim = sim.reshape(-1, 1)
        w_sum += sim
        tmp += sim * f
    w_sum[w_sum == 0] = 1.0
    st["f_G"] = (tmp / w_sum).astype(np.float32)
    return losses
