"""Global / per-class evaluation + validation loss.

Re-implements:
  * ``globaltest``  (reference: utils/evaluations.py:15-73) — the 7-metric
    suite; device-side batched inference, host-side sklearn-parity metrics.
  * ``classtest``   (reference: utils/evaluations.py:89-133) — single-class
    BACC/R/F1/P.
  * ``valloss``     (reference: utils/valloss_cal.py:15-43) — weighted BCE
    on a random 10% of the test set.
"""

from __future__ import annotations

import numpy as np

from fedmlp_tpu.eval import metrics as M
from fedmlp_tpu.ops import losses as L


def global_test(trainer, threshold: float = 0.5) -> dict:
    # host array in, streamed chunk-by-chunk (never fully HBM-resident)
    probs = trainer.eval_probs(trainer.global_vars, trainer.test_ds.images)
    return M.multilabel_report(trainer.test_ds.targets, probs, threshold)


def class_test(trainer, classid: int, threshold: float = 0.5) -> dict:
    probs = trainer.eval_probs(trainer.global_vars, trainer.test_ds.images)
    y = trainer.test_ds.targets
    preds = probs > threshold
    return {
        "BACC": M.bacc(y, preds, classid),
        "R": M.recall(y, preds, classid),
        "F1": M.f1_measure(y, preds, classid),
        "P": M.precision(y, preds, classid),
    }


def val_loss(trainer, frac: float = 0.1, seed: int = 0) -> float:
    """Weighted BCE on a random fraction of the test set (reference:
    utils/valloss_cal.py:15-43 — weight = N/class_count of the test set)."""
    rng = np.random.RandomState(seed)
    n = len(trainer.test_ds)
    sel = rng.choice(n, max(1, int(frac * n)), replace=False)
    images = np.ascontiguousarray(trainer.test_ds.images[sel])
    targets = trainer.test_ds.targets[sel]
    counts = np.maximum(trainer.test_ds.targets.sum(0), 1e-12)
    loss_w = (n / counts).astype(np.float32)
    probs = trainer.eval_probs(trainer.global_vars, images)
    logits = np.log(np.clip(probs, 1e-7, 1 - 1e-7)) - np.log(
        np.clip(1 - probs, 1e-7, 1 - 1e-7)
    )
    elem = np.asarray(L.bce_with_logits(logits, targets, loss_w))
    return float(elem.mean())
