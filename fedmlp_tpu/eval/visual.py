"""Feature visualization (reference: utils/feature_visual.py:12-38):
t-SNE (PCA init, perplexity 5) scatter of penultimate features, saved as
PNG under proto_fig/."""

from __future__ import annotations

import os

import numpy as np


def tsne_visual(features: np.ndarray, labels: np.ndarray, rnd: int,
                name: str, out_dir: str = "proto_fig") -> str:
    from sklearn.manifold import TSNE

    os.makedirs(out_dir, exist_ok=True)
    perplexity = min(5, max(2, len(features) - 1))
    ts = TSNE(n_components=2, init="pca", random_state=0,
              perplexity=perplexity)
    emb = ts.fit_transform(np.asarray(features, np.float64))
    emb = (emb - emb.min(0)) / np.maximum(emb.max(0) - emb.min(0), 1e-12)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    for i in range(len(emb)):
        plt.text(
            emb[i, 0], emb[i, 1], str(int(labels[i])),
            color=plt.cm.Set1(int(labels[i])), fontdict={"size": 8},
        )
    plt.xticks([])
    plt.yticks([])
    plt.title(f"round {rnd}: {name}")
    path = os.path.join(out_dir, f"round{rnd}_{name}.png")
    fig.savefig(path)
    plt.close(fig)
    return path


def roc_print(y_true, probs, out_path: str = "multi_models_roc.png",
              class_names=None) -> str:
    """Per-class ROC curve figure (reference ROCprint,
    utils/evaluations.py:76-86)."""
    from fedmlp_tpu.eval.metrics import _binary_clf_curve, roc_auc

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    y_true = np.asarray(y_true)
    probs = np.asarray(probs)
    fig = plt.figure()
    for c in range(y_true.shape[1]):
        fps, tps, _ = _binary_clf_curve(y_true[:, c].astype(float), probs[:, c])
        n_pos = max(y_true[:, c].sum(), 1)
        n_neg = max((1 - y_true[:, c]).sum(), 1)
        tpr = np.r_[0.0, tps] / n_pos
        fpr = np.r_[0.0, fps] / n_neg
        name = class_names[c] if class_names else str(c)
        auc_c = roc_auc(y_true[:, c], probs[:, c])
        plt.plot(fpr, tpr, lw=1, label=f"{name} (AUC={auc_c:.3f})")
    plt.plot([0, 1], [0, 1], "--", lw=1, color="grey")
    plt.xlim([0, 1])
    plt.ylim([0, 1])
    plt.xlabel("False Positive Rate")
    plt.ylabel("True Positive Rate")
    plt.title("ROC Curve")
    plt.legend(loc="lower right", fontsize=8)
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def fn_tn_loss_separation(trainer, client: int) -> dict:
    """Diagnostic: per-missing-class loss separation between hidden
    positives (false negatives) and true negatives (reference
    LocalUpdate.test_loss, utils/local_training.py:830-899)."""
    import jax.numpy as jnp

    fd = trainer.fd
    idx = np.asarray(fd.idx[client])
    valid = np.asarray(fd.valid[client])
    probs = trainer.eval_probs(trainer.global_vars, jnp.asarray(np.asarray(fd.images)[idx]))
    true_t = np.asarray(fd.targets)[idx]
    hidden = np.asarray(trainer.hidden)[idx]
    active = np.asarray(fd.active[client])
    eps = 1e-7
    bce0 = -np.log(np.clip(1 - probs, eps, None))  # loss of label=0 cells
    out = {}
    for c in range(fd.n_classes):
        if active[c]:
            continue
        fn_mask = valid & hidden[:, c] & (true_t[:, c] == 1)
        tn_mask = valid & (true_t[:, c] == 0)
        out[c] = {
            "fn_loss": float(bce0[fn_mask, c].mean()) if fn_mask.any() else np.nan,
            "tn_loss": float(bce0[tn_mask, c].mean()) if tn_mask.any() else np.nan,
        }
    return out
