"""Semantic quality: FedMLP's prototype tagger must recover hidden
positives better than chance — the core claim of the method (reference:
utils/local_training.py:1052-1112 tags 'noise' = hidden positives)."""

import numpy as np
import pytest

from fedmlp_tpu.config import Config, DataConfig, FedMLPConfig
from fedmlp_tpu.train import Trainer


@pytest.mark.slow
def test_noise_tags_enrich_true_hidden_positives():
    cfg = Config(
        algorithm="fedmlp",
        model="smallcnn",
        batch_size=16,
        base_lr=2e-3,
        n_clients=4,
        local_ep=1,
        rounds_warmup=8,
        eval_every=100,
        seed=13,
        p_pos=0.0,
        fedmlp=FedMLPConfig(rounds_stage1=4, clean_threshold=0.05,
                            noise_threshold=0.1),
        data=DataConfig(
            name="synthetic", n_classes=4, image_size=32,
            synthetic_train_size=320, synthetic_test_size=64,
        ),
        compute_dtype="float32",
    )
    t = Trainer(cfg)
    for rnd in range(8):
        t.run_round(rnd)

    tags = t.server_state["tags"]  # [K, M, C]
    true_k = np.asarray(t.fd.targets)[np.asarray(t.fd.idx)]  # [K, M, C]
    valid = np.asarray(t.fd.valid)[:, :, None]
    active = np.asarray(t.fd.active)[:, None, :]

    noise_cells = (tags == 2) & valid & ~active
    assert noise_cells.sum() > 10, "tagger must have tagged noise cells"
    noise_precision = true_k[noise_cells].mean()

    # baseline: prevalence of positives among all missing-class cells
    missing_cells = valid & ~np.broadcast_to(active, tags.shape)
    prevalence = true_k[missing_cells].mean()

    assert noise_precision > prevalence, (
        f"noise tags (precision {noise_precision:.3f}) must beat the "
        f"prevalence baseline ({prevalence:.3f})"
    )

    # clean tags should be depleted of positives
    clean_cells = (tags == 1) & valid & ~active
    if clean_cells.sum() > 10:
        clean_fp = true_k[clean_cells].mean()
        assert clean_fp < prevalence + 0.05
