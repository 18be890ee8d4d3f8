from fedmlp_tpu.eval.metrics import (
    average_precision,
    roc_auc,
    bacc,
    recall,
    precision,
    f1_measure,
    hamming_loss,
    multilabel_report,
)

__all__ = [
    "average_precision",
    "roc_auc",
    "bacc",
    "recall",
    "precision",
    "f1_measure",
    "hamming_loss",
    "multilabel_report",
]
