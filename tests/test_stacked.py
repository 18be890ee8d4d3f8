"""Channel-stacked lockstep execution == per-client lax.map execution.

The stacked path (models/stacked.py) must reproduce the regular Flax
apply exactly (f32): same logits, features, and BatchNorm running-stat
updates for every client, with genuinely different per-client weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fedmlp_tpu.models.efficientnet import efficientnet_b0
from fedmlp_tpu.models.smallcnn import smallcnn
from fedmlp_tpu.models.stacked import stacked_apply, supports_stacking

K, B = 3, 4


def _stacked_perturbed_vars(model, key, image):
    x0 = jnp.zeros((1, image, image, 3), jnp.float32)
    base = model.init(key, x0, train=False)

    def stack(path_leaf):
        leaves = []
        for k in range(K):
            kk = jax.random.fold_in(key, k + 1)
            leaves.append(path_leaf * (1.0 + 0.05 * jax.random.normal(
                jax.random.fold_in(kk, hash(str(path_leaf.shape)) % 7),
                path_leaf.shape)))
        return jnp.stack(leaves)

    return jax.tree_util.tree_map(stack, base)


@pytest.mark.parametrize("ctor,image", [(smallcnn, 32), (efficientnet_b0, 64)])
def test_stacked_matches_per_client(ctor, image):
    model = ctor(5, dtype=jnp.float32)
    assert supports_stacking(model)
    key = jax.random.PRNGKey(0)
    svars = _stacked_perturbed_vars(model, key, image)
    x = jnp.asarray(np.random.RandomState(0).randn(K, B, image, image, 3),
                    jnp.float32)

    # ---- eval mode ----
    (feat_s, log_s), st = stacked_apply(model, svars, x, train=False)
    assert st is None
    for k in range(K):
        vk = jax.tree_util.tree_map(lambda v: v[k], svars)
        fk, lk = model.apply(vk, x[k], train=False)
        np.testing.assert_allclose(np.asarray(log_s[k]), np.asarray(lk),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(feat_s[k]), np.asarray(fk),
                                   rtol=2e-4, atol=2e-4)

    # ---- train mode: outputs + BN running-stat updates ----
    (feat_s, log_s), new_stats = stacked_apply(model, svars, x, train=True)
    for k in range(K):
        vk = jax.tree_util.tree_map(lambda v: v[k], svars)
        (fk, lk), mut = model.apply(vk, x[k], train=True,
                                    mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(log_s[k]), np.asarray(lk),
                                   rtol=2e-4, atol=2e-4)
        ref_stats = mut["batch_stats"]
        got_k = jax.tree_util.tree_map(lambda v: v[k], new_stats)
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_stats)
        flat_got = dict(jax.tree_util.tree_leaves_with_path(got_k))
        assert len(flat_ref) == len(flat_got)
        for path, leaf in flat_ref:
            np.testing.assert_allclose(
                np.asarray(flat_got[path]), np.asarray(leaf),
                rtol=2e-4, atol=2e-4, err_msg=str(path))


def test_pointwise_formulations_agree():
    """blockdiag-matmul and grouped-conv pointwise forms == reference
    einsum, values and gradients (the cost model may pick either)."""
    from fedmlp_tpu.models.stacked import _bd_matmul

    rs = np.random.RandomState(3)
    Kk, ci, co, rows = 4, 6, 10, 50
    x = jnp.asarray(rs.randn(rows, Kk * ci), jnp.float32)
    w = jnp.asarray(rs.randn(Kk, ci, co), jnp.float32)

    def ref(x, w):
        x5 = x.reshape(rows, Kk, ci)
        return jnp.einsum("rkc,kcd->rkd", x5, w).reshape(rows, Kk * co)

    def grouped(x, w):
        rhs = jnp.transpose(w, (1, 0, 2)).reshape(1, 1, ci, Kk * co)
        return jax.lax.conv_general_dilated(
            x.reshape(rows, 1, 1, Kk * ci), rhs, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=Kk).reshape(rows, Kk * co)

    y_ref = ref(x, w)
    np.testing.assert_allclose(np.asarray(_bd_matmul(x, w)),
                               np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grouped(x, w)),
                               np.asarray(y_ref), rtol=1e-5, atol=1e-5)

    gt = jnp.asarray(rs.rand(rows, Kk * co), jnp.float32)
    for fn in (_bd_matmul, grouped):
        ga = jax.grad(lambda x, w: ((fn(x, w) - gt) ** 2).sum(),
                      argnums=(0, 1))(x, w)
        gr = jax.grad(lambda x, w: ((ref(x, w) - gt) ** 2).sum(),
                      argnums=(0, 1))(x, w)
        for a, b in zip(ga, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


def test_stacked_gradients_match():
    model = smallcnn(5, dtype=jnp.float32)
    key = jax.random.PRNGKey(1)
    svars = _stacked_perturbed_vars(model, key, 32)
    x = jnp.asarray(np.random.RandomState(1).randn(K, B, 32, 32, 3),
                    jnp.float32)
    y = jnp.asarray(np.random.RandomState(2).rand(K, B, 5) > 0.5, jnp.float32)

    def stacked_loss(params):
        (f, l), _ = stacked_apply(
            model, {"params": params,
                    "batch_stats": svars["batch_stats"]}, x, train=True)
        return (jax.nn.log_sigmoid(l) * y).sum()

    def mapped_loss(params):
        def one(k):
            vk = {"params": jax.tree_util.tree_map(lambda v: v[k], params),
                  "batch_stats": jax.tree_util.tree_map(
                      lambda v: v[k], svars["batch_stats"])}
            (f, l), _ = model.apply(vk, x[k], train=True,
                                    mutable=["batch_stats"])
            return (jax.nn.log_sigmoid(l) * y[k]).sum()
        return sum(one(k) for k in range(K))

    gs = jax.grad(stacked_loss)(svars["params"])
    gm = jax.grad(mapped_loss)(svars["params"])
    for a, b in zip(jax.tree_util.tree_leaves(gs),
                    jax.tree_util.tree_leaves(gm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)
