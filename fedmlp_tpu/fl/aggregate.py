"""Server-side aggregation rules, on-device.

Each rule takes client state stacked on a leading axis [K, ...] (the whole
pytree lives sharded over the ``client`` mesh axis) and reduces over it —
the reference's per-key Python dict loops (utils/FedAvg.py) become single
fused XLA reductions; under a sharded client axis XLA inserts the psum.

Covered (reference file:line):
  fedavg      — dataset-size weighted mean            utils/FedAvg.py:7-14
  fed_w       — arbitrary-weight mean                 utils/FedAvg.py:16-23
  rscfed      — sub-consensus distance-weighted agg   utils/FedAvg.py:25-41
  model_dist  — Σ per-leaf Frobenius norms            utils/FedAvg.py:43-49
  fedavg_tao  — per-class weighted τ over a client subset  utils/FedAvg.py:51-70
  fedavg_proto— per-class prototype pairs over active clients utils/FedAvg.py:72-93
  fedavg_rela — FedIRM relation-matrix rows           utils/FedAvg.py:95-103
  daagg       — FedNoRo distance-aware aggregation    utils/FedNoRo.py:84-103
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _weighted_mean_tree(stacked, weights):
    """Weighted mean over leading axis for every leaf. weights [K]."""
    w = jnp.asarray(weights, jnp.float32)
    wsum = w.sum()

    def leaf(x):
        wr = w.reshape((-1,) + (1,) * (x.ndim - 1)).astype(jnp.float32)
        return (x.astype(jnp.float32) * wr).sum(0) / wsum

    return jax.tree_util.tree_map(leaf, stacked)


def fedavg(stacked, dict_len):
    """FedAvg: weights = client dataset sizes (reference: utils/FedAvg.py:7-14)."""
    return _weighted_mean_tree(stacked, dict_len)


def fed_w(stacked, weight):
    """Generic weighted mean (reference: utils/FedAvg.py:16-23)."""
    return _weighted_mean_tree(stacked, weight)


def model_dist(tree_a, tree_b):
    """Σ_leaf ||a - b||_F (reference: utils/FedAvg.py:43-49). Float leaves
    only (the FedNoRo variant skips int tensors, utils/FedNoRo.py:110-111)."""
    leaves_a = jax.tree_util.tree_leaves(tree_a)
    leaves_b = jax.tree_util.tree_leaves(tree_b)
    total = jnp.float32(0.0)
    for a, b in zip(leaves_a, leaves_b):
        if not jnp.issubdtype(a.dtype, jnp.floating):
            continue
        total = total + jnp.linalg.norm(
            (a.astype(jnp.float32) - b.astype(jnp.float32)).reshape(-1)
        )
    return total


def _index_tree(stacked, i):
    return jax.tree_util.tree_map(lambda x: x[i], stacked)


def rscfed(dma_groups, stacked, K, dict_len, M):
    """RSCFed sub-consensus (reference: utils/FedAvg.py:25-41): for each of
    M random groups of K clients — uniform mean, then distance-reweighted
    mean with a = n_i/N_tot, b = exp(-0.01·dist_i/n_i); finally the uniform
    mean of the M sub-models. ``dma_groups`` is an int array [M, K]."""
    dict_len = jnp.asarray(dict_len, jnp.float32)
    subs = []
    for g in range(M):
        group = dma_groups[g]
        sel = jax.tree_util.tree_map(lambda x: x[group], stacked)
        w_avg = _weighted_mean_tree(sel, jnp.ones((K,)))
        weights = []
        n_total = dict_len[group].sum()
        for j in range(K):
            w_j = _index_tree(sel, j)
            a = dict_len[group[j]] / n_total
            b = jnp.exp(-0.01 * model_dist(w_j, w_avg) / dict_len[group[j]])
            weights.append(a * b)
        subs.append(_weighted_mean_tree(sel, jnp.stack(weights)))
    stacked_subs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *subs)
    return _weighted_mean_tree(stacked_subs, jnp.ones((M,)))


def fedavg_tao(taos, weight, class_client_mask=None):
    """Per-class weighted mean of confidence fractions τ, restricted to a
    client subset mask [C, K]; empty subset → 1.0 (reference:
    utils/FedAvg.py:51-70). NOTE: main.py:223 passes the *negative* client
    list — τ for class c is averaged over clients missing c."""
    t = jnp.asarray(taos, jnp.float32)  # [K, C]
    w = jnp.asarray(weight, jnp.float32)  # [K]
    if class_client_mask is None:
        return (t * w[:, None]).sum(0) / w.sum()
    m = jnp.asarray(class_client_mask, jnp.float32)  # [C, K]
    num = (m * (w[None, :] * t.T)).sum(1)  # [C]
    den = (m * w[None, :]).sum(1)
    return jnp.where(den > 0, num / jnp.maximum(den, 1e-12), 1.0)


def fedavg_proto(protos, weight, class_active_mask):
    """Per-class weighted mean of (proto_0, proto_1) pairs over clients that
    annotate the class (reference: utils/FedAvg.py:72-93).
    protos [K, 2C, D], mask [C, K] → [2C, D]."""
    p = jnp.asarray(protos, jnp.float32)
    w = jnp.asarray(weight, jnp.float32)
    m = jnp.asarray(class_active_mask, jnp.float32)  # [C, K]
    m2 = jnp.repeat(m, 2, axis=0)  # [2C, K] — same client set for both protos
    wm = m2 * w[None, :]  # [2C, K]
    num = jnp.einsum("ck,kcd->cd", wm, p)
    den = wm.sum(1)[:, None]
    return num / jnp.maximum(den, 1e-12)


def fedavg_rela(mats, weight, class_active_mask):
    """FedIRM relation-matrix row aggregation (reference:
    utils/FedAvg.py:95-103). mats [K, C, C], mask [C, K] → [C, C]."""
    p = jnp.asarray(mats, jnp.float32)
    w = jnp.asarray(weight, jnp.float32)
    m = jnp.asarray(class_active_mask, jnp.float32)
    wm = m * w[None, :]  # [C, K]
    num = jnp.einsum("ck,kcd->cd", wm, p)
    den = wm.sum(1)[:, None]
    return num / jnp.maximum(den, 1e-12)


def daagg(stacked, dict_len, clean_clients, noisy_clients):
    """FedNoRo distance-aware aggregation (reference: utils/FedNoRo.py:84-103):
    noisy clients downweighted by exp(-min distance to clean clients,
    normalized by the max distance)."""
    K = len(dict_len)
    w = jnp.asarray(dict_len, jnp.float32)
    w = w / w.sum()
    distance = jnp.zeros((K,), jnp.float32)
    for n_idx in noisy_clients:
        dists = jnp.stack(
            [
                model_dist(_index_tree(stacked, n_idx), _index_tree(stacked, c_idx))
                for c_idx in clean_clients
            ]
        )
        distance = distance.at[n_idx].set(dists.min())
    distance = distance / jnp.maximum(distance.max(), 1e-12)
    cw = w * jnp.exp(-distance)
    cw = cw / cw.sum()
    # NOTE: reference does NOT renormalize by sum inside the dict loop —
    # weights already sum to 1 here.
    def leaf(x):
        wr = cw.reshape((-1,) + (1,) * (x.ndim - 1))
        return (x.astype(jnp.float32) * wr).sum(0)

    return jax.tree_util.tree_map(leaf, stacked)
