"""CBAFed (class-balanced adaptive pseudo-labels).

Warm-up (rnd < rounds_CBAFed_warmup, reference: utils/local_training.py:
236-279): BCE_w over active classes only; clients report class_num_list /
data_num counters. Server (main.py:273-300): FedAvg, with residual weight
mixing every 5 rounds (0.2·new + 0.8·residual); at the warm-up boundary the
global threshold vector is computed:
    pt  = Σ class_num / Σ data_num
    tao = clip(pt + 0.45 − std(pt), 0.55, 0.95)

Post-warm-up (reference: utils/local_training.py:280-342): per missing
class c, batch samples with σ(logit) > τ_c get pseudo-label 1; samples with
σ < 1−τ_c count as clean; the per-batch dynamic pos_weight for c is
(noise+clean)/noise (or 1); loss = active-class supervised term + per-class
pseudo-label terms normalized by their counts. Server (main.py:301-316):
FedAvg weighted by reported data_nums, residual mixing 0.5/0.5 every 5
rounds; τ recomputed every round.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from fedmlp_tpu.algos.base import apply_train, masked_rows
from fedmlp_tpu.ops import losses as L
from fedmlp_tpu.parallel import fl_runtime as rt

VIEW_MODE = "single"
NEEDS_GLOBAL = False


def warmup_loss_fn(params, rest, model, views, sample, svalid, ctx, cstate,
                   rng, scalars):
    labels = sample["labels"]
    _, logits, new_rest = apply_train(model, params, rest, views["x"], rng)
    B = logits.shape[0]
    active = ctx["active"]
    sup = masked_rows(L.bce_with_logits(logits, labels, ctx["loss_w"]), svalid)
    loss = (sup * active[None, :]).sum() / (B * jnp.maximum(active.sum(), 1.0))
    aux = {"data_num": svalid.sum()}
    return loss, (new_rest, aux)


def pseudo_loss_fn(params, rest, model, views, sample, svalid, ctx, cstate,
                   rng, scalars):
    labels = sample["labels"]
    tao = scalars["tao"]  # [C]
    _, logits, new_rest = apply_train(model, params, rest, views["x"], rng)
    B, C = logits.shape
    active, negative = ctx["active"], ctx["negative"]
    sv = svalid.astype(jnp.float32)

    prob = jax.lax.stop_gradient(jax.nn.sigmoid(logits))
    is_noise = (prob > tao[None, :]) & (sv[:, None] > 0)  # pseudo-positive
    is_clean = (prob < (1.0 - tao)[None, :]) & (sv[:, None] > 0)
    pseudo_any = is_noise | is_clean

    labels2 = jnp.where(is_noise & (negative[None, :] > 0), 1.0, labels)
    noise_num = (is_noise * negative[None, :]).sum(0)  # [C]
    clean_num = (is_clean * negative[None, :]).sum(0)
    lw_dyn = jnp.where(
        noise_num > 0, (noise_num + clean_num) / jnp.maximum(noise_num, 1.0), 1.0
    )
    loss_w = jnp.where(negative > 0, lw_dyn, ctx["loss_w"])

    elem = masked_rows(L.bce_with_logits(logits, labels2, loss_w), svalid)
    loss = (elem * active[None, :]).sum() / (B * jnp.maximum(active.sum(), 1.0))
    # per missing class: pseudo-sample mean (reference :331-333)
    per_cls = (elem * pseudo_any * negative[None, :]).sum(0)
    cnt = (pseudo_any * negative[None, :]).sum(0)
    loss = loss + jnp.where(cnt > 0, per_cls / jnp.maximum(cnt, 1.0), 0.0).sum()

    class_num = active * sv.sum() + negative * cnt
    data_num = sv.sum() * jnp.maximum(active.sum(), 1.0) + (cnt * negative).sum()
    return loss, (new_rest, {"class_num": class_num, "data_num": data_num})


# the Trainer builds its default round_fn from `loss_fn`
loss_fn = warmup_loss_fn


def init_server_state(trainer):
    C = trainer.fd.n_classes
    return {"tao": np.full((C,), 0.95, np.float32), "residual": None}


def _get_pseudo_fn(trainer):
    if not hasattr(trainer, "_cbafed_pseudo_fn"):
        trainer._cbafed_pseudo_fn = rt.make_local_round(
            trainer.model, pseudo_loss_fn,
            lr=trainer.cfg.base_lr, batch_size=trainer.cfg.batch_size,
            mean=trainer.cfg.data.mean, std=trainer.cfg.data.std,
            view_mode="single",
            mesh=trainer.round_mesh,
            augment_backend=trainer.cfg.data.augment_backend,
            scan_unroll=trainer.cfg.scan_unroll,
            hoist_augment=bool(trainer.cfg.hoist_augment),
            weight_stream_dtype=trainer.weight_stream_dtype,
        )
    return trainer._cbafed_pseudo_fn


import functools


@functools.partial(jax.jit, static_argnames=("w_new",))
def _residual_mix(new_tree, res_tree, w_new):
    return jax.tree_util.tree_map(
        lambda a, b: w_new * a + (1.0 - w_new) * b, new_tree, res_tree
    )


def custom_round(trainer, rnd: int):
    st = trainer.server_state
    warmup = trainer.cfg.cbafed.rounds_warmup
    scalars = trainer.round_scalars(rnd)

    if rnd < warmup:
        out_state, losses, aux = trainer.local_pass(
            trainer.round_fn, {"labels": trainer.fd.obs_targets}, scalars
        )
        svars = out_state["vars"]
        # warm-up counters (reference :274-276): class_num[active] = data_num
        data_nums = np.asarray(aux["data_num"])  # [K]
        active = np.asarray(trainer.fd.active)
        class_nums = active * data_nums[:, None]
        w_new = trainer.aggregate(svars, trainer.dict_len)
        if rnd % 5 == 0:
            if rnd == 0 or st["residual"] is None:
                trainer.global_vars = w_new
            else:
                trainer.global_vars = _residual_mix(w_new, st["residual"], 0.2)
            st["residual"] = trainer.global_vars
        else:
            trainer.global_vars = w_new
        if rnd >= warmup - 1:
            _update_tao(st, class_nums, data_nums)
        return losses

    # ---------------- post-warm-up ----------------
    scalars["tao"] = jnp.asarray(st["tao"])
    out_state, losses, aux = trainer.local_pass(
        _get_pseudo_fn(trainer), {"labels": trainer.fd.obs_targets}, scalars
    )
    svars = out_state["vars"]
    class_nums = np.asarray(aux["class_num"])  # [K, C]
    data_nums = np.asarray(aux["data_num"])  # [K]
    wti = data_nums / max(data_nums.sum(), 1e-12)
    w_new = trainer.aggregate(svars, wti)
    if (rnd - warmup) % 5 == 0:
        if rnd - warmup == 0 or st["residual"] is None:
            trainer.global_vars = w_new
        else:
            trainer.global_vars = _residual_mix(w_new, st["residual"], 0.5)
        st["residual"] = trainer.global_vars
    else:
        trainer.global_vars = w_new
    _update_tao(st, class_nums, data_nums)
    return losses


def _update_tao(st, class_nums, data_nums):
    """tao = clip(pt + 0.45 − std(pt), 0.55, 0.95) (main.py:289-300)."""
    pt = class_nums.sum(0) / max(data_nums.sum(), 1e-12)
    std = np.sqrt(((pt - pt.mean()) ** 2).sum() / max(len(pt) - 1, 1))
    st["tao"] = np.clip(pt + 0.45 - std, 0.55, 0.95).astype(np.float32)
