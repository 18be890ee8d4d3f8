"""FedMLP — the flagship two-stage method (reference:
utils/local_training.py:904-1256 + server side main.py:216-237).

Stage 1 (rnd < rounds_stage1) — warm-up + prototype/τ estimation:
  local loss on two weak views (:935-963):
      BCE(probs, labels) averaged over views, active classes only
    + MSE(probs, frozen-global probs) averaged over views, missing classes
    + 0.0 · view-consistency (kept at zero, as released)
  at the last stage-1 round each client extracts per-class binary feature
  prototypes and per-missing-class confidence fractions t (:971-1002).

Stage 2 (rnd >= rounds_stage1) — pseudo-label tagging + training:
  1. harvest features of the untagged pool with the arriving global model
     (:1023-1049);
  2. per missing class: score = cos(f, proto_0) − cos(f, proto_1); clean
     candidates (score ≥ 0) vs noise candidates (score < 0) (:1052-1065);
  3. tag top clean_threshold·|clean| by score as clean and bottom
     noise_threshold·|noise| as noise — noise gets pseudo-label 1
     (:1066-1112); tags accumulate, pools shrink per class (:1197-1204);
  4. train on view 1 with BCE masked to confident classes (active ∪ tagged),
     normalized by the number of supervised cells (:1184-1188); the global-
     distillation term is computed but disabled in the released code — it
     is available behind cfg.fedmlp.stage2_distill;
  5. refresh prototypes/τ with the trained net over the full local set
     (:1208-1250).

Server: FedAvg of weights; τ ← weighted mean over clients MISSING the class
(main.py:223 passes class_negative_client_list); prototypes ← weighted mean
over clients annotating the class, full replacement λ=1 (main.py:230-234).

State is fixed-shape: tags live in an int8 [K, M, C] array
(0 untagged / 1 clean / 2 noise) instead of the reference's growing Python
index lists; selection counts are data-dependent so the top-k tagging step
runs host-side on the device-computed score matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fedmlp_tpu.algos.base import apply_train, masked_rows
from fedmlp_tpu.fl import fedavg_proto, fedavg_tao
from fedmlp_tpu.ops import losses as L
from fedmlp_tpu.ops.similarity import (
    confidence_fraction,
    fedmlp_similarity_scores,
    masked_binary_prototypes,
)
from fedmlp_tpu.parallel import fl_runtime as rt

VIEW_MODE = "dual"
NEEDS_GLOBAL = True


# ----------------------------------------------------------------------
# Stage-1 loss (engine-compatible)
# ----------------------------------------------------------------------

def loss_fn(params, rest, model, views, sample, svalid, ctx, cstate, rng, scalars):
    labels = sample["labels"]
    _, logits1, rest1 = apply_train(model, params, rest, views["x1"], rng)
    _, logits2, rest2 = apply_train(model, params, rest1, views["x2"], jax.random.fold_in(rng, 1))
    p1 = jax.nn.sigmoid(logits1)
    p2 = jax.nn.sigmoid(logits2)
    B, C = logits1.shape

    g1 = jax.nn.sigmoid(views["g_logits1"])
    g2 = jax.nn.sigmoid(views["g_logits2"])
    sup = (L.bce_on_probs(p1, labels) + L.bce_on_probs(p2, labels)) / 2.0
    dis = ((p1 - g1) ** 2 + (p2 - g2) ** 2) / 2.0
    sup = masked_rows(sup, svalid)
    dis = masked_rows(dis, svalid)
    active, negative = ctx["active"], ctx["negative"]
    loss_sup = (sup * active[None, :]).sum() / (B * jnp.maximum(active.sum(), 1.0))
    loss_dis = (dis * negative[None, :]).sum() / (B * jnp.maximum(negative.sum(), 1.0))
    return loss_sup + loss_dis, (rest2, {})


def loss_fn_viewcat(params, rest, model, views, sample, svalid, ctx, cstate,
                    rng, scalars):
    """Stage-1 loss with the two weak views run as ONE 2B forward.

    The reference runs net(x1) then net(x2) sequentially (utils/
    local_training.py:937-947); concatenating halves the conv op count —
    more importantly the 2B=64 batch halves the batch-minor lane-padding
    waste XLA's layout assignment puts on every C<=32 activation
    (BENCH_NOTES round-4 HLO study; measured +14% on the flagship, now
    the TPU default via view_concat='auto'). Semantics deviation: BN
    batch statistics are
    computed over the joint 2B batch and the running stats update once
    per step instead of twice; the loss math is otherwise identical to
    ``loss_fn``."""
    labels = sample["labels"]
    # "x12": views pre-concatenated once per step by the lockstep engine
    # (view_precat) — avoids a per-client layout-conversion copy in the map
    x = views.get("x12")
    if x is None:
        x = jnp.concatenate([views["x1"], views["x2"]], axis=0)
    _, logits, rest1 = apply_train(model, params, rest, x, rng)
    logits1, logits2 = jnp.split(logits, 2, axis=0)
    p1 = jax.nn.sigmoid(logits1)
    p2 = jax.nn.sigmoid(logits2)
    B, C = logits1.shape

    g1 = jax.nn.sigmoid(views["g_logits1"])
    g2 = jax.nn.sigmoid(views["g_logits2"])
    sup = (L.bce_on_probs(p1, labels) + L.bce_on_probs(p2, labels)) / 2.0
    dis = ((p1 - g1) ** 2 + (p2 - g2) ** 2) / 2.0
    sup = masked_rows(sup, svalid)
    dis = masked_rows(dis, svalid)
    active, negative = ctx["active"], ctx["negative"]
    loss_sup = (sup * active[None, :]).sum() / (B * jnp.maximum(active.sum(), 1.0))
    loss_dis = (dis * negative[None, :]).sum() / (B * jnp.maximum(negative.sum(), 1.0))
    return loss_sup + loss_dis, (rest1, {})


def stacked_loss_fn(params, rest, model, views, sample, svalid, ctx, rng,
                    scalars):
    """Stage-1 loss, channel-stacked over all K clients
    (parallel/fl_runtime.py::make_stacked_local_round). Same math as
    ``loss_fn``; the frozen-global logits arrive already batched at K·B."""
    from fedmlp_tpu.models.stacked import stacked_apply

    labels = sample["labels"]  # [K, B, C]
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    (_, logits1), st1 = stacked_apply(
        model, {"params": params, **rest}, views["x1"], train=True, rng=r1)
    rest1 = dict(rest)
    if st1 is not None:
        rest1["batch_stats"] = st1
    (_, logits2), st2 = stacked_apply(
        model, {"params": params, **rest1}, views["x2"], train=True, rng=r2)
    rest2 = dict(rest1)
    if st2 is not None:
        rest2["batch_stats"] = st2
    p1 = jax.nn.sigmoid(logits1)
    p2 = jax.nn.sigmoid(logits2)
    K, B, C = logits1.shape
    g1 = jax.nn.sigmoid(views["g_logits1"])
    g2 = jax.nn.sigmoid(views["g_logits2"])
    sup = (L.bce_on_probs(p1, labels) + L.bce_on_probs(p2, labels)) / 2.0
    dis = ((p1 - g1) ** 2 + (p2 - g2) ** 2) / 2.0
    sv = svalid.astype(sup.dtype)[..., None]
    sup = sup * sv
    dis = dis * sv
    active, negative = ctx["active"], ctx["negative"]  # [K, C]
    loss_sup = (sup * active[:, None, :]).sum(axis=(1, 2)) / (
        B * jnp.maximum(active.sum(1), 1.0))
    loss_dis = (dis * negative[:, None, :]).sum(axis=(1, 2)) / (
        B * jnp.maximum(negative.sum(1), 1.0))
    loss_k = loss_sup + loss_dis
    return loss_k.sum(), (rest2, loss_k)


# ----------------------------------------------------------------------
# Stage-2 loss: supervised-only on view 1 over confident cells
# ----------------------------------------------------------------------

def stage2_loss_fn(params, rest, model, views, sample, svalid, ctx, cstate,
                   rng, scalars):
    # stage 2 trains ONE view (reference :1176-1188); the engine runs
    # view_mode='single' so the discarded second weak augmentation of the
    # dual pipeline is never computed. 'x1' is accepted for compatibility
    # with dual-view callers (bitwise-identical tensor: both derive from
    # the first split of the step key).
    labels = sample["labels"]
    supmask = sample["supmask"]  # [B, C] — active ∪ tagged classes
    x1 = views["x"] if "x" in views else views["x1"]
    _, logits1, rest1 = apply_train(model, params, rest, x1, rng)
    p1 = jax.nn.sigmoid(logits1)
    cell = supmask * svalid.astype(supmask.dtype)[:, None]
    sup = L.bce_on_probs(p1, labels) * cell
    loss = sup.sum() / jnp.maximum(cell.sum(), 1.0)
    glog = views.get("g_logits", views.get("g_logits1"))
    if glog is not None:
        # paper-behavior distillation term (released code comments it out,
        # reference :1187-1188); only traced when cfg.fedmlp.stage2_distill
        # — a jnp.where would force the frozen-global forward every step
        dcell = (1.0 - supmask) * svalid.astype(supmask.dtype)[:, None]
        g1 = jax.nn.sigmoid(glog)
        dis = ((p1 - g1) ** 2) * dcell
        denom = jnp.maximum(cell.sum() + dcell.sum(), 1.0)
        loss = (sup.sum() + dis.sum()) / denom
    return loss, (rest1, {})


def stage2_stacked_loss_fn(params, rest, model, views, sample, svalid, ctx,
                           rng, scalars):
    """Stage-2 supervised loss, channel-stacked (see ``stage2_loss_fn``)."""
    from fedmlp_tpu.models.stacked import stacked_apply

    labels = sample["labels"]  # [K, B, C]
    supmask = sample["supmask"]
    x1 = views["x"] if "x" in views else views["x1"]
    (_, logits1), st1 = stacked_apply(
        model, {"params": params, **rest}, x1, train=True, rng=rng)
    rest1 = dict(rest)
    if st1 is not None:
        rest1["batch_stats"] = st1
    p1 = jax.nn.sigmoid(logits1)
    cell = supmask * svalid.astype(supmask.dtype)[..., None]
    sup = L.bce_on_probs(p1, labels) * cell
    denom = jnp.maximum(cell.sum(axis=(1, 2)), 1.0)
    loss_k = sup.sum(axis=(1, 2)) / denom
    glog = views.get("g_logits", views.get("g_logits1"))
    if glog is not None:
        dcell = (1.0 - supmask) * svalid.astype(supmask.dtype)[..., None]
        g1 = jax.nn.sigmoid(glog)
        dis = ((p1 - g1) ** 2) * dcell
        denom = jnp.maximum(cell.sum(axis=(1, 2)) + dcell.sum(axis=(1, 2)),
                            1.0)
        loss_k = (sup.sum(axis=(1, 2)) + dis.sum(axis=(1, 2))) / denom
    return loss_k.sum(), (rest1, loss_k)


def stage2_mixup_loss_fn(params, rest, model, views, sample, svalid, ctx,
                         cstate, rng, scalars):
    """Stage-2 with in-batch mixup (cfg.fedmlp.mixup): the TPU-native
    equivalent of the reference's DatasetSplit_Mixup + mixup_criterion
    (utils/local_training.py:1365-1415, 827-828 — an ablation path main.py
    never enables). Each sample mixes with a random batch partner with
    Beta(1,1) weight; the loss interpolates the two samples' supervised
    cells: lam·L(p, y_a | cell_a) + (1−lam)·L(p, y_b | cell_b)."""
    from fedmlp_tpu.ops.mixup import mixup_images

    labels = sample["labels"]
    supmask = sample["supmask"]
    kmix, kdrop = jax.random.split(rng)
    x1 = views["x"] if "x" in views else views["x1"]
    mixed, perm, lam = mixup_images(x1, kmix)
    _, logits1, rest1 = apply_train(model, params, rest, mixed, kdrop)
    p1 = jax.nn.sigmoid(logits1)
    sv = svalid.astype(supmask.dtype)
    cell_a = supmask * sv[:, None]
    cell_b = supmask[perm] * (sv * sv[perm])[:, None]  # both halves valid
    sup_a = (L.bce_on_probs(p1, labels) * cell_a).sum()
    sup_b = (L.bce_on_probs(p1, labels[perm]) * cell_b).sum()
    lam = lam.astype(sup_a.dtype)
    loss = (lam * sup_a / jnp.maximum(cell_a.sum(), 1.0)
            + (1.0 - lam) * sup_b / jnp.maximum(cell_b.sum(), 1.0))
    return loss, (rest1, {})


# ----------------------------------------------------------------------
# Extraction: prototypes + τ for every client (device, vmapped)
# ----------------------------------------------------------------------

def _extract_stats(trainer, feats, probs):
    """(features [K,M,D], probs [K,M,C]) → (taos [K,C], protos [K,2C,D]).

    Prototypes use OBSERVED labels of active classes (identical to true
    labels there); τ counts confident samples for missing classes
    (reference: utils/local_training.py:985-1000)."""
    fd = trainer.fd
    C = fd.n_classes

    def one(f, p, obs, valid, active):
        proto, _ = masked_binary_prototypes(f, obs, valid, C)
        # zero out prototypes of non-active classes (never aggregated anyway)
        keep = jnp.repeat(active, 2)[:, None]
        proto = proto * keep
        t = confidence_fraction(
            p, valid, trainer.cfg.fedmlp.L, trainer.cfg.fedmlp.U
        )
        t = t * (1.0 - active)  # reference only fills missing classes
        return t, proto

    if not hasattr(trainer, "_fedmlp_extract_jit"):
        trainer._fedmlp_extract_jit = jax.jit(jax.vmap(one))
    taos, protos = trainer._fedmlp_extract_jit(
        feats, probs, fd.obs_targets, fd.valid.astype(jnp.float32),
        fd.active.astype(jnp.float32),
    )
    return taos, protos


# ----------------------------------------------------------------------
# Host-side tagging (data-dependent top-k counts)
# ----------------------------------------------------------------------

def _update_tags(trainer, scores: np.ndarray, order: np.ndarray) -> None:
    """Accumulate clean/noise tags (reference: utils/local_training.py:
    1066-1112). scores [K, M, C]; ``order`` is the device-computed stable
    ascending argsort of scores along M (an argsort per (client, class) on
    the host cost ~1.7 s/round at ICH scale, K=20 M=26k; the TPU sorts the
    whole [K, M, C] tensor in one program).

    Fully vectorized over (K, C): pool membership is permuted into sorted
    order with take_along_axis, ranks come from a cumulative sum, and the
    per-(k, c) top/bottom-fraction cut becomes two rank comparisons —
    selecting by rank in the stable full-table sort is identical to a
    stable sort of the pool subset. No Python loop over clients/classes
    (the old O(K·C) candidate-list pass cost ~1.7 s/round at ICH scale)."""
    st = trainer.server_state
    tags = st["tags"]  # int8 [K, M, C]
    cfg = trainer.cfg.fedmlp
    valid = np.asarray(trainer.fd.valid)  # [K, M]
    active = np.asarray(trainer.fd.active).astype(bool)  # [K, C]
    K, M, C = tags.shape

    pool = valid[:, :, None] & (tags == 0)  # [K, M, C]
    n_clean_cand = (pool & (scores >= 0)).sum(axis=1)  # [K, C]
    n_noise_cand = (pool & (scores < 0)).sum(axis=1)
    if cfg.difficulty_estimate:
        # τ-scaled selection — the variant the reference ships commented
        # out (:1072-1073), with tao_min as the floor
        t = np.maximum(st["tao"].astype(np.float64), cfg.tao_min)[None, :]
        clean_frac, noise_frac = t, t
    else:
        clean_frac = np.float64(cfg.clean_threshold)
        noise_frac = np.float64(cfg.noise_threshold)
    clean_n = (clean_frac * n_clean_cand).astype(np.int64)  # [K, C]
    noise_n = (noise_frac * n_noise_cand).astype(np.int64)
    clean_n = np.where(active, 0, clean_n)
    noise_n = np.where(active, 0, noise_n)

    pool_sorted = np.take_along_axis(pool, order, axis=1)  # [K, M, C]
    rank = np.cumsum(pool_sorted, axis=1)  # 1-based rank within pool
    total = rank[:, -1:, :]  # [K, 1, C] pool size
    # noise_n ≤ |s<0 pool| and clean_n ≤ |s≥0 pool| ⇒ the two bands never
    # overlap; bottom band (most proto-1-similar) is noise, top is clean
    new_sorted = np.zeros((K, M, C), np.int8)
    noise_band = pool_sorted & (rank <= noise_n[:, None, :])
    clean_band = pool_sorted & (rank > total - clean_n[:, None, :])
    new_sorted[noise_band] = 2
    new_sorted[clean_band] = 1
    new_tags = np.zeros_like(tags)
    np.put_along_axis(new_tags, order, new_sorted, axis=1)
    np.copyto(tags, new_tags, where=new_tags != 0)


def _stage2_sample_arrays(trainer):
    """Pseudo labels + supervision mask from the tag state
    (DatasetSplit_pseudo semantics, reference: utils/local_training.py:
    1456-1469): zero all non-active classes, set 1 where tagged noise;
    supervise active ∪ tagged cells."""
    fd = trainer.fd
    tags = trainer.server_state["tags"]
    active = np.asarray(fd.active)[:, None, :]  # [K,1,C]
    true_k = np.asarray(fd.targets)[np.asarray(fd.idx)]  # [K,M,C]
    labels = true_k * active
    labels = np.where(tags == 2, 1.0, labels).astype(np.float32)
    supmask = (active | (tags > 0)).astype(np.float32)
    return {
        "labels": jnp.asarray(labels),
        "supmask": jnp.asarray(supmask),
    }


# ----------------------------------------------------------------------
# Trainer hooks
# ----------------------------------------------------------------------

def init_server_state(trainer):
    fd = trainer.fd
    C = fd.n_classes
    D = trainer.model.apply  # placeholder; feature dim resolved lazily
    from fedmlp_tpu.models import feature_dim_of

    feat_dim = feature_dim_of(trainer.cfg.model)
    return {
        "tao": np.zeros((C,), np.float32),
        "proto": np.zeros((2 * C, feat_dim), np.float32),
        "tags": np.zeros((fd.n_clients, fd.max_local, C), np.int8),
    }


def _get_harvest(trainer):
    if not hasattr(trainer, "_fedmlp_harvest"):
        trainer._fedmlp_harvest = rt.make_harvest_fn(
            trainer.model, trainer.cfg.data.mean, trainer.cfg.data.std,
            batch_size=trainer.cfg.batch_size * 4,
            mesh=trainer.round_mesh,
            augment_backend=trainer.cfg.data.augment_backend,
        )
    return trainer._fedmlp_harvest


def _get_stage2_fn(trainer):
    if not hasattr(trainer, "_fedmlp_stage2_fn"):
        if trainer._use_stacked() and not trainer.cfg.fedmlp.mixup:
            trainer._fedmlp_stage2_fn = rt.make_stacked_local_round(
                trainer.model,
                stage2_stacked_loss_fn,
                lr=trainer.cfg.base_lr,
                batch_size=trainer.cfg.batch_size,
                mean=trainer.cfg.data.mean,
                std=trainer.cfg.data.std,
                # stage 2 trains on one view (reference :1176-1188); the
                # single view == the dual pipeline's view 1 bitwise
                view_mode="single",
                needs_global=trainer.cfg.fedmlp.stage2_distill,
                donate=True,
                augment_backend=trainer.cfg.data.augment_backend,
                scan_unroll=trainer.cfg.scan_unroll,
                hoist_augment=bool(trainer.cfg.hoist_augment),
            )
            return trainer._fedmlp_stage2_fn
        if trainer._use_lockstep() and not trainer.cfg.fedmlp.mixup:
            # lockstep order: with stage2_distill the frozen-global forward
            # batches at K·B; without it the engine still batches the
            # augmentation call across clients
            trainer._fedmlp_stage2_fn = rt.make_lockstep_local_round(
                trainer.model,
                stage2_loss_fn,
                lr=trainer.cfg.base_lr,
                batch_size=trainer.cfg.batch_size,
                mean=trainer.cfg.data.mean,
                std=trainer.cfg.data.std,
                view_mode="single",
                needs_global=trainer.cfg.fedmlp.stage2_distill,
                donate=True,
                mesh=trainer.round_mesh,
                augment_backend=trainer.cfg.data.augment_backend,
                scan_unroll=trainer.cfg.scan_unroll,
                client_unroll=bool(trainer.cfg.client_unroll),
                small_pack=trainer.cfg.small_pack,
            )
            return trainer._fedmlp_stage2_fn
        trainer._fedmlp_stage2_fn = rt.make_local_round(
            trainer.model,
            stage2_mixup_loss_fn if trainer.cfg.fedmlp.mixup
            else stage2_loss_fn,
            lr=trainer.cfg.base_lr,
            batch_size=trainer.cfg.batch_size,
            mean=trainer.cfg.data.mean,
            std=trainer.cfg.data.std,
            # stage 2 trains on view 1 only (reference :1176-1188) — the
            # dual pipeline's second weak augmentation was discarded, so
            # run single-view; the frozen-global forward exists only for
            # the optional distill term
            view_mode="single",
            needs_global=trainer.cfg.fedmlp.stage2_distill,
            donate=True,
            mesh=trainer.round_mesh,
            augment_backend=trainer.cfg.data.augment_backend,
            scan_unroll=trainer.cfg.scan_unroll,
            hoist_augment=bool(trainer.cfg.hoist_augment),
            weight_stream_dtype=trainer.weight_stream_dtype,
        )
    return trainer._fedmlp_stage2_fn


def _aggregate_tao_proto(trainer, taos, protos, rnd):
    st = trainer.server_state
    neg_mask = (~np.asarray(trainer.fd.active)).T  # [C, K] clients missing c
    act_mask = np.asarray(trainer.fd.active).T  # [C, K]
    st["tao"] = np.asarray(
        fedavg_tao(taos, trainer.dict_len, neg_mask)
    )
    st["proto"] = np.asarray(
        fedavg_proto(protos, trainer.dict_len, act_mask)
    )  # λ=1: full replacement (main.py:233-234)


def custom_round(trainer, rnd: int):
    cfg = trainer.cfg
    stage1_rounds = cfg.fedmlp.rounds_stage1
    if rnd < stage1_rounds:
        out_state, losses, _ = trainer.local_pass(
            trainer.round_fn, {"labels": trainer.fd.obs_targets},
            trainer.round_scalars(rnd),
        )
        svars = out_state["vars"]
        if rnd == stage1_rounds - 1:
            harvest = _get_harvest(trainer)
            feats, probs = harvest(
                svars, trainer.fd.images, trainer.fd.idx, trainer.next_key(),
                loader=getattr(trainer, "loader", None),
            )
            taos, protos = _extract_stats(trainer, feats, probs)
            _aggregate_tao_proto(trainer, taos, protos, rnd)
        trainer.global_vars = trainer.aggregate(svars, trainer.dict_len)
        return losses

    # ---------------- stage 2 ----------------
    harvest = _get_harvest(trainer)
    gstack = trainer.broadcast(trainer.global_vars)
    feats, probs = harvest(
        gstack, trainer.fd.images, trainer.fd.idx, trainer.next_key(),
        loader=getattr(trainer, "loader", None),
    )
    proto = jnp.asarray(trainer.server_state["proto"])
    if not hasattr(trainer, "_fedmlp_score_jit"):
        def _scores_and_order(f, p):
            s = jax.vmap(fedmlp_similarity_scores, in_axes=(0, None))(f, p)
            return s, jnp.argsort(s, axis=1)  # stable, on device

        trainer._fedmlp_score_jit = jax.jit(_scores_and_order)
    scores_d, order_d = trainer._fedmlp_score_jit(feats, proto)  # [K, M, C]
    _update_tags(trainer, np.asarray(scores_d), np.asarray(order_d))

    sample_arrays = _stage2_sample_arrays(trainer)
    scalars = trainer.round_scalars(rnd)
    out_state, losses, _ = trainer.local_pass(
        _get_stage2_fn(trainer), sample_arrays, scalars
    )
    svars = out_state["vars"]

    feats, probs = harvest(
        svars, trainer.fd.images, trainer.fd.idx, trainer.next_key(),
        loader=getattr(trainer, "loader", None),
    )
    taos, protos = _extract_stats(trainer, feats, probs)
    _aggregate_tao_proto(trainer, taos, protos, rnd)
    trainer.global_vars = trainer.aggregate(svars, trainer.dict_len)
    return losses
