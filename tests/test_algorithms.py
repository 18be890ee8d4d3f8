"""Every federated algorithm runs 2-3 rounds on the synthetic fixture with
finite losses and correct state transitions (SURVEY.md §4 integration tier)."""

import numpy as np
import pytest

from fedmlp_tpu.config import CBAFedConfig, Config, DataConfig, FedIRMConfig
from fedmlp_tpu.train import Trainer


def cfg_for(algo, **kw):
    base = dict(
        algorithm=algo,
        model="smallcnn",
        batch_size=16,
        base_lr=1e-3,
        n_clients=4,
        local_ep=1,
        rounds_warmup=3,
        eval_every=100,
        seed=11,
        data=DataConfig(
            name="synthetic", n_classes=4, image_size=32,
            synthetic_train_size=192, synthetic_test_size=48,
        ),
        compute_dtype="float32",
    )
    base.update(kw)
    return Config(**base)


def run_rounds(trainer, n):
    recs = [trainer.run_round(r) for r in range(n)]
    for rec in recs:
        assert np.isfinite(rec.client_losses).all(), rec
    return recs


def test_fednoro():
    t = Trainer(cfg_for("fednoro"))
    run_rounds(t, 2)


def test_fixmatch():
    t = Trainer(cfg_for("fixmatch"))
    run_rounds(t, 2)


def test_fedlsr():
    t = Trainer(cfg_for("fedlsr"))
    run_rounds(t, 2)


def test_rscfed_teacher_persists_and_moves():
    import jax

    t = Trainer(cfg_for("rscfed"))
    run_rounds(t, 1)
    tea1 = jax.tree_util.tree_leaves(t._rscfed_teacher["params"])[0].copy()
    run_rounds_second = t.run_round(1)
    tea2 = jax.tree_util.tree_leaves(t._rscfed_teacher["params"])[0]
    assert np.isfinite(np.asarray(run_rounds_second.client_losses)).all()
    # EMA teacher moved between rounds
    assert np.abs(np.asarray(tea1) - np.asarray(tea2)).max() > 0


def test_cbafed_warmup_to_pseudo_transition():
    t = Trainer(cfg_for("cbafed", cbafed=CBAFedConfig(rounds_warmup=2)))
    run_rounds(t, 2)
    tao = t.server_state["tao"]
    assert tao.shape == (4,)
    assert (tao >= 0.55).all() and (tao <= 0.95).all()
    # post-warmup pseudo-label round
    rec = t.run_round(2)
    assert np.isfinite(rec.client_losses).all()


def test_fedirm_phases_and_relation_matrix():
    t = Trainer(cfg_for("fedirm", fedirm=FedIRMConfig(rounds_sup=2)))
    run_rounds(t, 1)
    # relation matrix still the 0.5 prior during supervised phase
    assert (t.server_state["relation"] == 0.5).all()
    t.run_round(1)  # boundary: relation matrix aggregated
    rel = t.server_state["relation"]
    assert rel.shape == (4, 4)
    assert not (rel == 0.5).all()
    rec = t.run_round(2)  # relation phase with EMA teacher
    assert np.isfinite(rec.client_losses).all()


def test_rofl_centroids_and_pseudo():
    t = Trainer(cfg_for("rofl"))
    run_rounds(t, 2)
    st = t.server_state
    assert np.isfinite(st["f_G"]).all()
    assert st["pseudo"].shape == (4, t.fd.max_local, 4)
    assert set(np.unique(st["pseudo"])) <= {0.0, 1.0}


def test_fednoro_post_warmup_clean_noisy_dispatch():
    from fedmlp_tpu.config import FedNoRoConfig

    t = Trainer(cfg_for("fednoro",
                        fednoro=FedNoRoConfig(rounds_warmup=1, begin=0, end=2)))
    run_rounds(t, 1)  # warm-up round
    rec = t.run_round(1)  # post-warm-up: GMM split + DaAgg + branch dispatch
    assert np.isfinite(rec.client_losses).all()
    st = t.server_state
    assert st["clean"] is not None and st["noisy"] is not None
    assert len(st["clean"]) + len(st["noisy"]) == 4
    rec = t.run_round(2)  # a round with the noisy_flag ctx active
    assert np.isfinite(rec.client_losses).all()
