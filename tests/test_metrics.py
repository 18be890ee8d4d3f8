"""Metric parity vs sklearn and reference semantics (SURVEY.md §4)."""

import numpy as np
import pytest
from sklearn.metrics import average_precision_score, auc, roc_curve

from fedmlp_tpu.eval import metrics as M


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("ties", [False, True])
def test_average_precision_matches_sklearn(seed, ties):
    rng = np.random.RandomState(seed)
    y = (rng.rand(257) < 0.3).astype(int)
    y[0] = 1  # ensure at least one positive
    s = rng.rand(257)
    if ties:
        s = np.round(s, 1)  # force heavy ties
    assert M.average_precision(y, s) == pytest.approx(
        average_precision_score(y, s), abs=1e-12
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("ties", [False, True])
def test_roc_auc_matches_sklearn(seed, ties):
    rng = np.random.RandomState(seed)
    y = (rng.rand(311) < 0.4).astype(int)
    y[0], y[1] = 1, 0
    s = rng.rand(311)
    if ties:
        s = np.round(s, 1)
    fpr, tpr, _ = roc_curve(y, s, pos_label=1)
    assert M.roc_auc(y, s) == pytest.approx(auc(fpr, tpr), abs=1e-12)


def test_hard_metrics_hand_computed():
    # 4 samples, 2 classes
    y_true = np.array([[1, 0], [1, 1], [0, 0], [0, 1]])
    y_pred = np.array([[1, 0], [0, 1], [0, 1], [0, 1]])
    # class 0: TP=1 P=2 -> r=0.5 ; class 1: TP=2 P=2 -> r=1.0
    assert M.recall(y_true, y_pred) == pytest.approx(0.75)
    # precision: class0 TP/pred = 1/1, class1 = 2/3 -> mean over C
    assert M.precision(y_true, y_pred) == pytest.approx((1.0 + 2 / 3) / 2)
    # f1: class0 2*1/(2+1)=2/3 ; class1 2*2/(2+3)=4/5
    assert M.f1_measure(y_true, y_pred) == pytest.approx((2 / 3 + 4 / 5) / 2)
    # hamming: 2 wrong of 8
    assert M.hamming_loss(y_true, y_pred) == pytest.approx(0.25)
    # bacc class0: r1=1/2, r0=#~(t|p)/#neg=2/2 -> 0.75; class1: r1=1, r0=1/2 -> 0.75
    assert M.bacc(y_true, y_pred) == pytest.approx(0.75)


def test_precision_skips_zero_pred_class():
    y_true = np.array([[1, 1], [0, 1]])
    y_pred = np.array([[1, 0], [0, 0]])  # class 1 never predicted
    # reference divides by C even when skipping -> (1/1 + skip)/2
    assert M.precision(y_true, y_pred) == pytest.approx(0.5)


def test_multilabel_report_keys():
    rng = np.random.RandomState(0)
    y = (rng.rand(64, 5) < 0.3).astype(float)
    y[0] = 1  # every class has a positive
    p = rng.rand(64, 5)
    rep = M.multilabel_report(y, p)
    assert set(rep) == {"mAP", "BACC", "R", "F1", "auc", "P", "hamming_loss"}
    for v in rep.values():
        assert np.isfinite(v)
