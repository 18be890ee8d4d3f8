"""Loss parity vs torch (CPU) reference criteria."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fedmlp_tpu.ops import losses as L


@pytest.fixture
def batch(rng):
    logits = rng.randn(16, 5).astype(np.float32)
    targets = (rng.rand(16, 5) < 0.4).astype(np.float32)
    return logits, targets


def test_bce_with_logits_matches_torch(batch, rng):
    logits, targets = batch
    pos_w = rng.uniform(0.5, 8.0, size=5).astype(np.float32)
    ours = np.asarray(L.bce_with_logits(logits, targets, pos_w))
    theirs = torch.nn.BCEWithLogitsLoss(
        pos_weight=torch.tensor(pos_w), reduction="none"
    )(torch.tensor(logits), torch.tensor(targets)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_bce_on_probs_matches_torch(batch):
    logits, targets = batch
    probs = 1 / (1 + np.exp(-logits))
    ours = np.asarray(L.bce_on_probs(probs, targets))
    theirs = F.binary_cross_entropy(
        torch.tensor(probs), torch.tensor(targets), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_masked_class_mean_matches_index_slice(batch):
    logits, targets = batch
    loss = np.asarray(L.bce_with_logits(logits, targets))
    active = np.array([1, 0, 0, 1, 0], dtype=bool)
    # reference pattern: loss[:, cls_list].sum() / (batch * n_active)
    want = loss[:, [0, 3]].sum() / (16 * 2)
    got = float(L.masked_class_mean(loss, active, batch_size=16))
    assert got == pytest.approx(want, rel=1e-6)


def test_la_kd_matches_torch_composition(batch, rng):
    logits, targets = batch
    probs = 1 / (1 + np.exp(-logits))
    soft = rng.rand(16, 5).astype(np.float32)
    active = np.zeros(5, dtype=bool)
    active[2] = True
    negative = ~active
    w_kd = 0.37
    # torch: bce over active + mse over negative, normalized by B * |set|
    bce = F.binary_cross_entropy(
        torch.tensor(probs), torch.tensor(targets), reduction="none"
    )[:, [2]].sum() / (16 * 1)
    kl = F.mse_loss(
        torch.tensor(probs), torch.tensor(soft), reduction="none"
    )[:, [0, 1, 3, 4]].sum() / (16 * 4)
    want = w_kd * kl + (1 - w_kd) * bce
    got = float(L.la_kd(probs, targets, soft, w_kd, active, negative, batch_size=16))
    assert got == pytest.approx(float(want), rel=1e-5)


def test_sigmoid_mse_matches_torch(batch):
    logits, t = batch
    target_logits = logits[::-1].copy()
    ours = np.asarray(L.sigmoid_mse(logits, target_logits))
    theirs = (
        (torch.sigmoid(torch.tensor(logits)) - torch.sigmoid(torch.tensor(target_logits)))
        ** 2
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)


def test_kd_symmetric_kl_matches_torch(rng):
    q = rng.uniform(0.05, 0.95, size=(8, 8)).astype(np.float32)
    p = rng.uniform(0.05, 0.95, size=(8, 8)).astype(np.float32)
    want = (
        (
            F.kl_div(torch.tensor(q).log(), torch.tensor(p), None, None, "batchmean")
            + F.kl_div(torch.tensor(p).log(), torch.tensor(q), None, None, "batchmean")
        )
        / 2.0
    ).item()
    got = float(L.kd_symmetric_kl(q, p))
    assert got == pytest.approx(want, rel=1e-5)


def test_js_matches_torch(rng):
    p = rng.uniform(0.05, 0.95, size=(4, 5)).astype(np.float32)
    q = rng.uniform(0.05, 0.95, size=(4, 5)).astype(np.float32)
    kld = torch.nn.KLDivLoss(reduction="mean")
    log_m = ((torch.tensor(p) + torch.tensor(q)) / 2).log()
    want = ((kld(log_m, torch.tensor(p)) + kld(log_m, torch.tensor(q))) / 2).item()
    got = float(L.js_divergence(p, q))
    assert got == pytest.approx(want, rel=1e-5)


def test_rampups_match_reference_formulas():
    # utils/local_training.py:83-90
    assert L.sigmoid_rampup(0, 30) == pytest.approx(np.exp(-5.0))
    assert L.sigmoid_rampup(30, 30) == pytest.approx(1.0)
    assert L.sigmoid_rampup(50, 30) == pytest.approx(1.0)
    # utils/FedNoRo.py:72-81
    assert L.sigmoid_rampup_bounded(10, 10, 499) == pytest.approx(np.exp(-5.0))
    assert L.sigmoid_rampup_bounded(499, 10, 499) == pytest.approx(1.0)


def test_pos_weight_from_counts():
    w = L.pos_weight_from_counts(100, np.array([10, 50, 100]))
    np.testing.assert_allclose(w, [10.0, 2.0, 1.0])
