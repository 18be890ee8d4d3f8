"""RSCFed (mean-teacher SSL with sub-consensus aggregation).

Local step (reference: utils/local_training.py:705-769): student trains on
view 1; a PERSISTENT local mean teacher (initialized from the initial
global model, main.py:77) forwards view 2; per-step teacher EMA over the
full state_dict with weight 0.001 (:752-760). Loss:
    BCE_w(logits1, y) over active classes / (B·|active|)
  + MSE(σ(logits1), σ(teacher_logits2)) mean over missing-class cells.

Server (main.py:114-121, 213-215): M=10 random groups of K=6 clients →
distance-reweighted sub-consensus (utils/FedAvg.py:25-41).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from fedmlp_tpu.algos.base import apply_train, masked_rows
from fedmlp_tpu.fl import rscfed as agg_rscfed
from fedmlp_tpu.ops import losses as L
from fedmlp_tpu.parallel import fl_runtime as rt

VIEW_MODE = "dual"
NEEDS_GLOBAL = False
TEACHER_DECAY = 0.999  # weight1 = 1 - 0.001


def loss_fn(params, rest, model, views, sample, svalid, ctx, cstate, rng, scalars):
    labels = sample["labels"]
    _, logits1, new_rest = apply_train(model, params, rest, views["x1"], rng)
    p1 = jax.nn.sigmoid(logits1)
    pt = jax.nn.sigmoid(views["t_logits2"])
    B = logits1.shape[0]
    active, negative = ctx["active"], ctx["negative"]

    sup = masked_rows(L.bce_with_logits(logits1, labels, ctx["loss_w"]), svalid)
    loss_sup = (sup * active[None, :]).sum() / (B * jnp.maximum(active.sum(), 1.0))
    mse = masked_rows((p1 - pt) ** 2, svalid)
    # torch F.mse_loss 'mean' over the [B, |neg|] submatrix
    loss_unsup = (mse * negative[None, :]).sum() / (
        B * jnp.maximum(negative.sum(), 1.0)
    )
    return loss_sup + loss_unsup, (new_rest, {})


def make_round_fn(trainer):
    return rt.make_local_round(
        trainer.model, loss_fn,
        lr=trainer.cfg.base_lr, batch_size=trainer.cfg.batch_size,
        mean=trainer.cfg.data.mean, std=trainer.cfg.data.std,
        view_mode="dual", needs_global=False,
        teacher_decay=TEACHER_DECAY, teacher_scope="all",
        mesh=trainer.round_mesh,
        augment_backend=trainer.cfg.data.augment_backend,
        scan_unroll=trainer.cfg.scan_unroll,
        hoist_augment=bool(trainer.cfg.hoist_augment),
        weight_stream_dtype=trainer.weight_stream_dtype,
    )


def get_persistent(trainer):
    """Checkpoint protocol: the persistent mean teacher survives resume."""
    if hasattr(trainer, "_rscfed_teacher"):
        return {"teacher": trainer._rscfed_teacher}
    return {}


def set_persistent(trainer, state):
    if "teacher" in state:
        trainer._rscfed_teacher = state["teacher"]


def custom_round(trainer, rnd: int):
    if not hasattr(trainer, "_rscfed_round_fn"):
        trainer._rscfed_round_fn = make_round_fn(trainer)
    if not hasattr(trainer, "_rscfed_teacher"):
        # teacher starts as the INITIAL global model (main.py:77) and then
        # persists across rounds (restored separately on resume)
        trainer._rscfed_teacher = trainer.broadcast(trainer.global_vars)
    out_state, losses, _ = trainer.local_pass(
        trainer._rscfed_round_fn, {"labels": trainer.fd.obs_targets},
        trainer.round_scalars(rnd),
        extra_state={"teacher": trainer._rscfed_teacher},
    )
    trainer._rscfed_teacher = out_state["teacher"]
    svars = out_state["vars"]

    # DMA sub-consensus groups (main.py:114-121)
    K_g = min(6, trainer.n_clients)
    M = 10
    dma = np.stack(
        [
            trainer.rng.choice(trainer.n_clients, size=K_g, replace=False)
            for _ in range(M)
        ]
    )
    if not hasattr(trainer, "_rscfed_agg_jit"):
        import functools
        trainer._rscfed_agg_jit = jax.jit(
            functools.partial(agg_rscfed, K=K_g, M=M),
            static_argnames=(),
        )
    trainer.global_vars = trainer._rscfed_agg_jit(
        jnp.asarray(dma), svars, dict_len=jnp.asarray(trainer.dict_len, jnp.float32)
    )
    return losses
