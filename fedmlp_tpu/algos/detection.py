"""Noisy-client detection for FedNoRo's post-warm-up phase.

The reference imports GaussianMixture and defines the clean/noisy training
branches (utils/local_training.py:162-231) and DaAgg aggregation
(utils/FedNoRo.py:84-103), but main.py never wires the detection step. The
FedNoRo paper's recipe — fit a 2-component GMM over per-client mean losses
and call the higher-mean component noisy — is provided here so the full
pipeline is available.
"""

from __future__ import annotations

import numpy as np


def split_clean_noisy_gmm(client_losses: np.ndarray, seed: int = 0):
    """2-component GMM over per-client scalar losses → (clean, noisy) id
    lists. Falls back to a median split when the GMM collapses."""
    from sklearn.mixture import GaussianMixture

    x = np.asarray(client_losses, np.float64).reshape(-1, 1)
    if len(x) < 2:
        return list(range(len(x))), []
    gmm = GaussianMixture(n_components=2, random_state=seed).fit(x)
    labels = gmm.predict(x)
    noisy_comp = int(np.argmax(gmm.means_.ravel()))
    noisy = [i for i, l in enumerate(labels) if l == noisy_comp]
    clean = [i for i, l in enumerate(labels) if l != noisy_comp]
    if not clean:  # degenerate fit
        order = np.argsort(x.ravel())
        half = max(1, len(order) // 2)
        clean, noisy = order[:half].tolist(), order[half:].tolist()
    return clean, noisy
