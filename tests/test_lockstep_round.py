"""Lockstep-engine round == mapped-engine round (FedMLP).

The lockstep loop order (scan over steps outside, lax.map over clients
inside, frozen-global forwards batched at K·B —
parallel/fl_runtime.py::make_lockstep_local_round) must produce the same
training trajectory as the mapped engine. With augmentation pinned to
'normonly' (no RNG consumption) and a dropout-free f32 model the only
difference between the two programs is reduction/batching order, so the
match is tight.
"""

import jax
import numpy as np

from fedmlp_tpu.config import Config, DataConfig, FedMLPConfig
from fedmlp_tpu.train import Trainer


def _cfg(batched_global: str, **kw) -> Config:
    return Config(
        algorithm="fedmlp",
        model="smallcnn",
        batch_size=8,
        base_lr=1e-3,
        n_clients=4,
        local_ep=1,
        rounds_warmup=4,
        eval_every=10_000,
        seed=7,
        p_pos=0.0,
        data=DataConfig(name="synthetic", n_classes=5, image_size=32,
                        synthetic_train_size=96, synthetic_test_size=16,
                        augment_backend="normonly"),
        fedmlp=FedMLPConfig(rounds_stage1=2, clean_threshold=0.2,
                            noise_threshold=0.2, **kw),
        compute_dtype="float32",
        client_stacking="off",
        batched_global=batched_global,
        output_dir="",
    )


def _run(cfg, rounds=3):
    t = Trainer(cfg, use_mesh=False)
    per_round = []
    for rnd in range(rounds):
        rec = t.run_round(rnd)
        per_round.append(rec.client_losses)
    return t, per_round


def test_lockstep_round_matches_mapped():
    t_map, l_map = _run(_cfg("off"))
    t_lock, l_lock = _run(_cfg("on"))
    assert t_lock._use_lockstep() and not t_map._use_lockstep()

    # rounds 0-1 are stage 1 (dual view + frozen-global distillation, the
    # batched-forward path), round 2 is stage 2 (tagging + single view)
    np.testing.assert_allclose(l_map, l_lock, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        t_map.server_state["tags"], t_lock.server_state["tags"]
    )
    # atol 5e-4: the engines compute identical math in different reduction
    # orders (K·B-batched vs per-client frozen-global forwards), so after 3
    # rounds of Adam a stray weight can drift a few 1e-4 — observed 2.3e-4
    # on one element of 73,728 after the bce_on_probs custom-VJP landed
    for a, b in zip(jax.tree_util.tree_leaves(t_map.global_vars),
                    jax.tree_util.tree_leaves(t_lock.global_vars)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-4)


def test_view_precat_bitwise():
    """view_precat hoists the viewcat 2B concat out of the per-client map
    (one [Kl, 2B, ...] concat per step). Same concat order ⇒ the training
    trajectory must be BITWISE identical to the in-map concat."""
    import dataclasses

    # viewcat forced on on both sides (auto resolves off on CPU), precat
    # flipped between them
    cfg_on = dataclasses.replace(_cfg("on"), view_concat="on",
                                 view_precat="on")
    cfg_no = dataclasses.replace(_cfg("on"), view_concat="on",
                                 view_precat="off")
    t_pre, l_pre = _run(cfg_on, rounds=2)
    t_nop, l_nop = _run(cfg_no, rounds=2)
    np.testing.assert_array_equal(np.asarray(l_pre), np.asarray(l_nop))
    for a, b in zip(jax.tree_util.tree_leaves(t_pre.global_vars),
                    jax.tree_util.tree_leaves(t_nop.global_vars)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_small_pack_bitwise():
    """small_pack ravels the map's tiny f32 output leaves (BN scale/bias
    grads + running stats) into one flat vector inside the map and slices
    them back outside — reshape/concat/slice only, so the training
    trajectory must be BITWISE identical through both stages (stage 2's
    lockstep factory receives the knob too, algos/fedmlp.py)."""
    import dataclasses

    cfg_off = dataclasses.replace(_cfg("on"), small_pack=0)
    cfg_on = dataclasses.replace(_cfg("on"), small_pack=4096)
    t_off, l_off = _run(cfg_off, rounds=3)
    t_on, l_on = _run(cfg_on, rounds=3)
    assert t_on._use_lockstep()
    np.testing.assert_array_equal(np.asarray(l_off), np.asarray(l_on))
    for a, b in zip(jax.tree_util.tree_leaves(t_off.global_vars),
                    jax.tree_util.tree_leaves(t_on.global_vars)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lockstep_stage2_distill_matches_mapped():
    """The stage-2 distillation variant routes g_logits through the
    single-view lockstep path ('g_logits' key) — must equal mapped."""
    t_map, l_map = _run(_cfg("off", stage2_distill=True))
    t_lock, l_lock = _run(_cfg("on", stage2_distill=True))
    np.testing.assert_allclose(l_map, l_lock, rtol=1e-4, atol=1e-5)
