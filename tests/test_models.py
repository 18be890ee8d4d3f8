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
