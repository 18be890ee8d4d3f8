#!/usr/bin/env python
"""Per-step trace of one client's local-training trajectory, outside the
scan engine: loss, grad norm, param norm, |logit|max and supervised-BCE
per step, with the engine's own batch plan, masking, augmentation and
Adam chain mirrored exactly.

This is the tool that located the round-3 saturation NaN: client logits
grow across long local epochs until sigmoid saturates (|logit| >= ~16.7
in f32) — the per-step |logit|max column shows the drift hundreds of
steps before anything else looks wrong (see BENCH_NOTES.md "long-local-
epoch NaN root cause").

Usage:
  python tools/probe_client_trajectory.py            # flagship-shaped
  PT_CLIENT=1 PT_LOCAL_EP=5 PT_DTYPE=float32 PT_MODEL=efficient_b0 \
      python tools/probe_client_trajectory.py

Prints one line per PT_LOG_EVERY steps and stops at the first non-finite
loss.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fedmlp_tpu.config import Config, DataConfig, FedMLPConfig
    from fedmlp_tpu.data.datasets import make_synthetic_dataset
    from fedmlp_tpu.train import Trainer
    from fedmlp_tpu.parallel import fl_runtime as rt
    from fedmlp_tpu.algos import fedmlp as FM
    from fedmlp_tpu.ops import losses as L

    K = int(os.environ.get("PT_CLIENT", "1"))
    DTYPE = os.environ.get("PT_DTYPE", "float32")
    MODEL = os.environ.get("PT_MODEL", "efficient_b0")
    LOCAL_EP = int(os.environ.get("PT_LOCAL_EP", "5"))
    N = int(os.environ.get("PT_TRAIN_N", str(2 * 1856)))
    B = int(os.environ.get("PT_BATCH", "32"))
    SIZE = int(os.environ.get("PT_IMAGE", "224"))
    EVERY = int(os.environ.get("PT_LOG_EVERY", "10"))

    train_ds = make_synthetic_dataset(N, 8, SIZE, seed=1037)
    test_ds = make_synthetic_dataset(512, 8, SIZE, seed=2037)
    cfg = Config(
        algorithm="fedmlp", model=MODEL, batch_size=B, base_lr=3e-5,
        n_clients=2, local_ep=LOCAL_EP, rounds_warmup=4, eval_every=10_000,
        seed=1037, p_pos=0.0, fedmlp=FedMLPConfig(rounds_stage1=4),
        data=DataConfig(name="synthetic", n_classes=8, image_size=SIZE),
        compute_dtype=DTYPE, output_dir="",
    )
    t = Trainer(cfg, train_ds=train_ds, test_ds=test_ds)
    pos, pos_valid, _ = rt.make_batch_plan(
        t.rng, np.asarray(t.fd.valid), B, LOCAL_EP)
    S = pos.shape[0]
    print(f"client={K} steps={S} dtype={DTYPE}", flush=True)
    sample_arrays = {"labels": t.fd.obs_targets}
    imgs, sample = rt.gather_round_data(
        t.fd.images, t.fd.idx, sample_arrays, jnp.asarray(pos))
    ctx = {k: v[K] for k, v in t.client_ctx().items()}
    print("active:", np.asarray(ctx["active"]),
          "negative:", np.asarray(ctx["negative"]), flush=True)

    gv = t.global_vars
    model = t.model
    tx = rt.torch_adam(cfg.base_lr, 5e-4)
    weak = rt._pick_weak_backend(
        "fused" if jax.devices()[0].platform == "tpu" else "gather")
    mean, std = cfg.data.mean, cfg.data.std

    def step(vars_k, opt_k, imgs_u8, sample_k, svalid, key):
        ka, kl = jax.random.split(key)
        k1, k2 = jax.random.split(ka)
        x1 = weak(imgs_u8, k1, mean, std)
        x2 = weak(imgs_u8, k2, mean, std)
        _, g1 = model.apply(gv, x1, train=False)
        _, g2 = model.apply(gv, x2, train=False)
        views = {"x1": x1, "x2": x2, "g_logits1": g1, "g_logits2": g2}
        params = vars_k["params"]
        rest = {k: v for k, v in vars_k.items() if k != "params"}

        def lf(p):
            return FM.loss_fn(p, rest, model, views, sample_k, svalid, ctx,
                              None, kl, {})

        (loss, (new_rest, _)), grads = (
            jax.value_and_grad(lf, has_aux=True)(params))
        updates, new_opt = tx.update(grads, opt_k, params)
        new_params = optax.apply_updates(params, updates)
        new_vars = dict(new_rest)
        new_vars["params"] = new_params
        _, logits1, _ = FM.apply_train(model, params, rest, views["x1"], kl)
        gnorm = optax.global_norm(grads)
        pnorm = optax.global_norm(params)
        lmax = jnp.abs(logits1).max()
        sup = L.bce_on_probs(jax.nn.sigmoid(logits1),
                             sample_k["labels"]).mean()
        return new_vars, new_opt, loss, gnorm, pnorm, lmax, sup

    jstep = jax.jit(step, donate_argnums=(0, 1))
    vars_k = jax.tree_util.tree_map(lambda x: x[K], t._broadcast_jit(gv))
    opt_k = tx.init(vars_k["params"])
    key = jax.random.fold_in(jax.random.split(t._jkey)[1], K)

    for s in range(S):
        key, sub = jax.random.split(key)
        im = imgs[s, K]
        sm = {k: v[s, K] for k, v in sample.items()}
        sv = jnp.asarray(pos_valid)[s, K]
        vars_k, opt_k, loss, gnorm, pnorm, lmax, supl = jstep(
            vars_k, opt_k, im, sm, sv, sub)
        l = float(loss)
        if s % EVERY == 0 or not np.isfinite(l) or float(lmax) > 50:
            print(f"step {s}: loss={l:.4f} gnorm={float(gnorm):.3e} "
                  f"pnorm={float(pnorm):.2f} |logit|max={float(lmax):.2f} "
                  f"sup={float(supl):.4f}", flush=True)
        if not np.isfinite(l):
            print("FIRST NON-FINITE at step", s)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
