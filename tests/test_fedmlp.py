"""FedMLP two-stage integration on the synthetic fixture (SURVEY.md §4:
assert stage transitions — τ/prototype shapes, monotone pool shrinkage)."""

import numpy as np
import pytest

from fedmlp_tpu.config import Config, DataConfig, FedMLPConfig
from fedmlp_tpu.train import Trainer


@pytest.fixture(scope="module")
def trainer():
    cfg = Config(
        algorithm="fedmlp",
        model="smallcnn",
        batch_size=16,
        base_lr=1e-3,
        n_clients=4,
        local_ep=1,
        rounds_warmup=5,
        eval_every=100,
        seed=3,
        p_pos=0.0,  # task heterogeneity: all non-active positives hidden
        fedmlp=FedMLPConfig(
            rounds_stage1=2, clean_threshold=0.1, noise_threshold=0.1
        ),
        data=DataConfig(
            name="synthetic", n_classes=4, image_size=32,
            synthetic_train_size=256, synthetic_test_size=64,
        ),
        compute_dtype="float32",
    )
    return Trainer(cfg)


def test_stage1_rounds_no_tags(trainer):
    rec0 = trainer.run_round(0)
    assert np.isfinite(rec0.client_losses).all()
    assert trainer.server_state["tags"].sum() == 0
    # tao still zero before extraction round
    assert trainer.server_state["tao"].sum() == 0


def test_stage1_final_round_extracts_tao_proto(trainer):
    trainer.run_round(1)  # rounds_stage1 - 1 → extraction
    st = trainer.server_state
    C = trainer.fd.n_classes
    assert st["tao"].shape == (C,)
    assert st["proto"].shape == (2 * C, 128)
    # every class is active on exactly one client → prototypes nonzero
    assert np.abs(st["proto"]).sum() > 0
    # τ entries are fractions
    assert (st["tao"] >= 0).all() and (st["tao"] <= 1.0).all()


def test_stage2_tags_accumulate_and_pool_shrinks(trainer):
    st = trainer.server_state
    trainer.run_round(2)
    tags_r2 = st["tags"].copy()
    n2 = (tags_r2 > 0).sum()
    assert n2 > 0, "stage 2 must tag samples"
    # tagged cells only on non-active classes
    active = np.asarray(trainer.fd.active)
    for k in range(trainer.n_clients):
        for c in range(trainer.fd.n_classes):
            if active[k, c]:
                assert (tags_r2[k, :, c] == 0).all()
    trainer.run_round(3)
    tags_r3 = st["tags"]
    n3 = (tags_r3 > 0).sum()
    assert n3 >= n2, "tags accumulate monotonically"
    # previously tagged cells never flip
    prev = tags_r2 > 0
    np.testing.assert_array_equal(tags_r3[prev], tags_r2[prev])


def test_stage2_losses_finite(trainer):
    rec = trainer.run_round(4)
    assert np.isfinite(rec.client_losses).all()


def test_noise_tags_give_pseudo_positive_labels(trainer):
    from fedmlp_tpu.algos.fedmlp import _stage2_sample_arrays

    arrays = _stage2_sample_arrays(trainer)
    labels = np.asarray(arrays["labels"])
    supmask = np.asarray(arrays["supmask"])
    tags = trainer.server_state["tags"]
    assert (labels[tags == 2] == 1.0).all()
    assert (supmask[tags > 0] == 1.0).all()
    active = np.asarray(trainer.fd.active)[:, None, :]
    untagged_missing = (tags == 0) & ~np.broadcast_to(active, tags.shape)
    assert (supmask[untagged_missing] == 0.0).all()
