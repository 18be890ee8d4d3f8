"""Partitioning, label masking, and dataset fixtures."""

import numpy as np
import pytest

from fedmlp_tpu.data import (
    build_client_index_table,
    build_hidden_mask,
    iid_sampling,
    make_synthetic_dataset,
    non_iid_dirichlet_sampling,
    observed_targets,
)
from fedmlp_tpu.data.masking import build_active_matrix, class_client_lists


def test_iid_sampling_partitions_disjoint_and_seeded():
    d1 = iid_sampling(1000, 8, seed=1037)
    d2 = iid_sampling(1000, 8, seed=1037)
    assert {k: sorted(v) for k, v in d1.items()} == {k: sorted(v) for k, v in d2.items()}
    all_idx = sum((list(v) for v in d1.values()), [])
    assert len(all_idx) == len(set(all_idx)) == 8 * 125


def test_non_iid_dirichlet_covers_population(rng):
    y = (rng.rand(500, 5) < 0.3).astype(np.float32)
    d = non_iid_dirichlet_sampling(y, 5, p=1.0, num_users=5, seed=1037, alpha_dirichlet=0.5)
    all_idx = sum((list(v) for v in d.values()), [])
    assert len(all_idx) == len(set(all_idx)) == 500


def test_hidden_mask_full_hiding(rng):
    t = (rng.rand(200, 4) < 0.4).astype(np.float32)
    hidden = build_hidden_mask(t, p_pos=0.0, seed_rng=np.random.RandomState(0))
    # p_pos=0 -> every positive hidden, negatives never hidden
    np.testing.assert_array_equal(hidden, t.astype(bool))


def test_hidden_mask_partial(rng):
    t = np.zeros((100, 2), dtype=np.float32)
    t[:60, 0] = 1
    hidden = build_hidden_mask(t, p_pos=0.5, seed_rng=np.random.RandomState(0))
    assert hidden[:, 0].sum() == 30
    assert hidden[:, 1].sum() == 0


def test_observed_targets_masks_only_nonactive(rng):
    t = (rng.rand(50, 3) < 0.5).astype(np.float32)
    hidden = build_hidden_mask(t, p_pos=0.0, seed_rng=np.random.RandomState(0))
    active_row = np.array([True, False, False])
    obs = observed_targets(t, hidden, active_row)
    np.testing.assert_array_equal(obs[:, 0], t[:, 0])  # active class untouched
    np.testing.assert_array_equal(obs[:, 1], 0)  # all positives hidden
    np.testing.assert_array_equal(obs[:, 2], 0)


def test_client_index_table_padding():
    d = {0: [3, 1, 2], 1: [7]}
    idx, valid = build_client_index_table(d, 2, pad_multiple=4)
    assert idx.shape == (2, 4)
    np.testing.assert_array_equal(idx[0], [1, 2, 3, 1])
    np.testing.assert_array_equal(valid[0], [True, True, True, False])
    np.testing.assert_array_equal(valid[1], [True, False, False, False])


def test_class_client_lists_matches_reference_shape():
    # active = [[0],[1],[2]] like main.py:76
    active = build_active_matrix([[0], [1], [2]], 3)
    ca, cn = class_client_lists(active)
    assert ca == [[0], [1], [2]]
    assert cn == [[1, 2], [0, 2], [0, 1]]


def test_synthetic_dataset_learnable():
    ds = make_synthetic_dataset(64, 5, image_size=32, seed=0)
    assert ds.images.shape == (64, 32, 32, 3)
    assert ds.targets.shape == (64, 5)
    # every class has positives and negatives
    s = ds.targets.sum(axis=0)
    assert (s >= 2).all() and (s <= 62).all()
