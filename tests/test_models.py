"""Model zoo: (feature, logits) contract, shapes, jit-ability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fedmlp_tpu.models import build_model, feature_dim_of
from fedmlp_tpu.models.factory import init_model

SMALL_ZOO = ["resnet18", "efficient_b0", "vgg11", "dense121", "senet50"]


@pytest.mark.parametrize("name", SMALL_ZOO)
def test_forward_contract(name):
    model = build_model(name, num_classes=5, compute_dtype=jnp.float32)
    size = 64 if name != "vgg11" else 224  # vgg classifier expects 7x7 pool
    variables = init_model(model, jax.random.PRNGKey(0), size, batch=2)
    x = jnp.ones((2, size, size, 3), jnp.float32)
    (feature, logits), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert feature.shape == (2, feature_dim_of(name))
    assert logits.shape == (2, 5)
    assert feature.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()


def test_reference_spellings_accepted():
    for ref_name in ["Resnet18", "Efficient_b0", "Dense121", "SENet50", "Vgg11"]:
        build_model(ref_name, num_classes=8)


def test_eval_mode_uses_running_stats():
    model = build_model("resnet18", 5, compute_dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), 32, batch=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    f1, l1 = model.apply(variables, x, train=False)
    f2, l2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_normed_head_scale():
    model = build_model("resnet18", 5, compute_dtype=jnp.float32, normed_head=True)
    variables = init_model(model, jax.random.PRNGKey(0), 32, batch=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    _, logits = model.apply(variables, x, train=False)
    # cosine head output bounded by s=30
    assert np.abs(np.asarray(logits)).max() <= 30.0 + 1e-4


def test_jit_forward():
    model = build_model("resnet18", 5, compute_dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), 32, batch=2)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)

    f, l = fwd(variables, jnp.ones((2, 32, 32, 3)))
    assert l.shape == (2, 5)


def _mk_remat_model(family, mode):
    if family == "efficientnet":
        from fedmlp_tpu.models.efficientnet import EfficientNet

        blocks = ((1, 16, 1, 1, 3), (6, 24, 1, 2, 3), (6, 40, 1, 2, 5))
        return EfficientNet(1.0, 1.0, 5, dtype=jnp.float32, blocks=blocks,
                            remat=(mode is True),
                            remat_stages=(0, 1) if mode == "stages" else ())
    from fedmlp_tpu.models.resnet import BasicBlock, ResNet

    return ResNet([1, 1], BasicBlock, 5, dtype=jnp.float32, remat=mode)


@pytest.mark.parametrize("family", ["efficientnet", "resnet"])
def test_remat_grads_match_base(family):
    """remat=True (and the selective ``remat_stages`` variant) must be a
    pure execution-schedule change: identical param tree, loss, gradients,
    and batch-stats updates (models/efficientnet.py ``EfficientNet.remat``
    / ``remat_stages``, models/resnet.py ``ResNet.remat``). Reduced block
    tables keep the compile fast."""
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    y = jax.random.bernoulli(jax.random.PRNGKey(2), 0.5, (2, 5)).astype(
        jnp.float32)
    modes = [False, True] + (["stages"] if family == "efficientnet" else [])
    outs = {}
    for remat in modes:
        model = _mk_remat_model(family, remat)
        variables = init_model(model, jax.random.PRNGKey(0), 32, batch=2)

        def loss(p, bs):
            (_f, logits), upd = model.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(3)})
            return jnp.mean((jax.nn.sigmoid(logits) - y) ** 2), upd

        (l, upd), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(
            variables["params"], variables["batch_stats"])
        outs[remat] = (l, g, upd)

    l0, g0, u0 = outs[False]
    for mode in modes[1:]:
        l1, g1, u1 = outs[mode]
        assert (jax.tree_util.tree_structure(g0)
                == jax.tree_util.tree_structure(g1))
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(u0),
                        jax.tree_util.tree_leaves(u1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
