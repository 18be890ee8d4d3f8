"""Depthwise-conv backend equivalence: the 'taps' VPU formulation must be
algebraically identical to the XLA grouped-conv lowering for every
(kernel, stride) combination EfficientNet uses (reference MBConv shapes:
model/efficientnet.py:28-89)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fedmlp_tpu.models.efficientnet import _same_pads, efficientnet_b0
from fedmlp_tpu.ops.depthwise import depthwise_taps


@pytest.mark.parametrize("k,s,hw,c", [
    (3, 1, 14, 8), (3, 2, 15, 8), (5, 1, 14, 16), (5, 2, 14, 16),
    (3, 2, 14, 8),  # even input, stride 2 (asymmetric SAME pad)
])
def test_taps_matches_grouped_conv(k, s, hw, c):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, hw, hw, c), jnp.float32)
    w = jnp.asarray(rs.randn(k, k, 1, c), jnp.float32)
    pads = (_same_pads(hw, k, s), _same_pads(hw, k, s))
    ref = jax.lax.conv_general_dilated(
        x, w, (s, s), padding=list(pads),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    got = depthwise_taps(x, w, s, pads)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_taps_gradients_match():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 9, 9, 4), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 1, 4), jnp.float32)
    pads = (_same_pads(9, 3, 2), _same_pads(9, 3, 2))

    def f_ref(x, w):
        return (jax.lax.conv_general_dilated(
            x, w, (2, 2), padding=list(pads),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=4) ** 2).sum()

    def f_taps(x, w):
        return (depthwise_taps(x, w, 2, pads) ** 2).sum()

    gr = jax.grad(f_ref, argnums=(0, 1))(x, w)
    gt = jax.grad(f_taps, argnums=(0, 1))(x, w)
    for a, b in zip(gr, gt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_b0_backends_agree_end_to_end():
    model_c = efficientnet_b0(5, dtype=jnp.float32, dw_backend="conv")
    model_t = efficientnet_b0(5, dtype=jnp.float32, dw_backend="taps")
    x = jnp.asarray(np.random.RandomState(2).randn(2, 64, 64, 3), jnp.float32)
    variables = model_c.init(jax.random.PRNGKey(0), x, train=False)
    # identical parameter pytree → converters/checkpoints are backend-agnostic
    fc, lc = model_c.apply(variables, x, train=False)
    ft, lt = model_t.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(lc), np.asarray(lt),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fc), np.asarray(ft),
                               rtol=1e-4, atol=1e-4)
