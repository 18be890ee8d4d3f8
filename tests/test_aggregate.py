"""Aggregation parity vs the reference's dict-loop semantics (recomputed in
numpy here, since the rules are simple closed forms)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fedmlp_tpu.fl import (
    daagg,
    fed_w,
    fedavg,
    fedavg_proto,
    fedavg_rela,
    fedavg_tao,
    model_dist,
    rscfed,
)


def _stack(trees):
    import jax

    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


@pytest.fixture
def client_trees(rng):
    return [
        {"w": rng.randn(4, 3).astype(np.float32), "b": rng.randn(3).astype(np.float32)}
        for _ in range(4)
    ]


def test_fedavg_matches_manual(client_trees):
    dict_len = [10, 20, 30, 40]
    got = fedavg(_stack(client_trees), dict_len)
    want_w = sum(t["w"] * l for t, l in zip(client_trees, dict_len)) / 100
    np.testing.assert_allclose(np.asarray(got["w"]), want_w, rtol=1e-5)


def test_fed_w_uniform_equals_mean(client_trees):
    got = fed_w(_stack(client_trees), [1, 1, 1, 1])
    want = np.mean([t["b"] for t in client_trees], axis=0)
    np.testing.assert_allclose(np.asarray(got["b"]), want, rtol=1e-5)


def test_model_dist_is_sum_of_frobenius(client_trees):
    a, b = client_trees[0], client_trees[1]
    want = np.linalg.norm(a["w"] - b["w"]) + np.linalg.norm(a["b"] - b["b"])
    assert float(model_dist(a, b)) == pytest.approx(want, rel=1e-5)


def test_fedavg_tao_restricted(rng):
    taos = rng.rand(3, 4).astype(np.float32)  # K=3, C=4
    weight = np.array([1.0, 2.0, 3.0])
    # class c's client subset: class 0 -> {0,1}; class 1 -> {} ; 2 -> {2}; 3 -> all
    mask = np.array(
        [[1, 1, 0], [0, 0, 0], [0, 0, 1], [1, 1, 1]], dtype=bool
    )
    got = np.asarray(fedavg_tao(taos, weight, mask))
    want0 = (taos[0, 0] * 1 + taos[1, 0] * 2) / 3
    assert got[0] == pytest.approx(want0, rel=1e-5)
    assert got[1] == pytest.approx(1.0)  # empty subset → 1.0
    assert got[2] == pytest.approx(taos[2, 2], rel=1e-5)
    want3 = (taos[:, 3] * weight).sum() / weight.sum()
    assert got[3] == pytest.approx(want3, rel=1e-5)


def test_fedavg_proto_per_class_weighting(rng):
    K, C, D = 3, 2, 8
    protos = rng.randn(K, 2 * C, D).astype(np.float32)
    weight = np.array([1.0, 2.0, 3.0])
    mask = np.array([[1, 0, 1], [0, 1, 0]], dtype=bool)  # class0: {0,2}; class1: {1}
    got = np.asarray(fedavg_proto(protos, weight, mask))
    want_c0_p0 = (protos[0, 0] * 1 + protos[2, 0] * 3) / 4
    want_c0_p1 = (protos[0, 1] * 1 + protos[2, 1] * 3) / 4
    np.testing.assert_allclose(got[0], want_c0_p0, rtol=1e-5)
    np.testing.assert_allclose(got[1], want_c0_p1, rtol=1e-5)
    np.testing.assert_allclose(got[2], protos[1, 2], rtol=1e-5)


def test_fedavg_rela(rng):
    K, C = 3, 4
    mats = rng.rand(K, C, C).astype(np.float32)
    weight = np.array([2.0, 1.0, 1.0])
    mask = np.eye(4, 3, dtype=bool)  # class i active on client i (i<3)
    mask[3] = [True, True, False]
    got = np.asarray(fedavg_rela(mats, weight, mask))
    np.testing.assert_allclose(got[0], mats[0, 0], rtol=1e-5)
    want3 = (mats[0, 3] * 2 + mats[1, 3] * 1) / 3
    np.testing.assert_allclose(got[3], want3, rtol=1e-5)


def test_rscfed_uniform_groups_reduces_towards_mean(client_trees):
    stacked = _stack(client_trees)
    dma = np.array([[0, 1, 2, 3], [0, 1, 2, 3]])
    got = rscfed(dma, stacked, K=4, dict_len=[10, 10, 10, 10], M=2)
    # with equal sizes + identical groups the result stays near the mean
    mean_w = np.mean([t["w"] for t in client_trees], axis=0)
    diff = np.abs(np.asarray(got["w"]) - mean_w).max()
    assert diff < 0.2


def test_daagg_downweights_noisy(client_trees):
    # make client 3 far away
    client_trees[3]["w"] = client_trees[3]["w"] + 100.0
    stacked = _stack(client_trees)
    got = daagg(stacked, [10, 10, 10, 10], clean_clients=[0, 1, 2], noisy_clients=[3])
    mean_clean = np.mean([client_trees[i]["w"] for i in range(3)], axis=0)
    # aggregated weights should sit much closer to the clean mean than to client 3
    d_clean = np.linalg.norm(np.asarray(got["w"]) - mean_clean)
    d_noisy = np.linalg.norm(np.asarray(got["w"]) - client_trees[3]["w"])
    assert d_clean < d_noisy
