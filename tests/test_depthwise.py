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


# ---- Pallas flat-shift backward (ops/dw_pallas.py) ----

def _ref_conv_hi(x, w, s, pads):
    return jax.lax.conv_general_dilated(
        x, w, (s, s), padding=list(pads),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
        precision=jax.lax.Precision.HIGHEST,
    )


@pytest.mark.parametrize("hw,c,k", [(12, 8, 3), (8, 4, 3), (8, 16, 5),
                                    (14, 32, 3)])
def test_flat_conv_forward_exact(hw, c, k):
    from fedmlp_tpu.ops.dw_pallas import dw_conv_flat_s1, flat_supported

    assert flat_supported(hw, hw, c)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, hw, hw, c), jnp.float32)
    w = jnp.asarray(rs.randn(k, k, 1, c), jnp.float32)
    pads = (_same_pads(hw, k, 1), _same_pads(hw, k, 1))
    got = dw_conv_flat_s1(x, w, pads, interpret=True)
    ref = _ref_conv_hi(x, w, 1, pads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("hw,c,k,s", [
    (12, 8, 3, 1), (12, 8, 3, 2), (8, 16, 5, 2), (14, 32, 3, 2),
    (8, 4, 5, 1), (16, 8, 5, 2),
])
def test_pallas_vjp_matches_native(hw, c, k, s):
    """dx and dw of the Pallas backward vs XLA's native VJP at HIGHEST
    precision, with a shared explicit cotangent (so forward-precision
    differences cannot leak into the comparison)."""
    from fedmlp_tpu.ops.dw_pallas import dw_conv_pallas

    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, hw, hw, c), jnp.float32)
    w = jnp.asarray(rs.randn(k, k, 1, c), jnp.float32)
    pads = (_same_pads(hw, k, s), _same_pads(hw, k, s))
    yr, vjp_ref = jax.vjp(lambda x, w: _ref_conv_hi(x, w, s, pads), x, w)
    ym, vjp_mine = jax.vjp(
        lambda x, w: dw_conv_pallas(x, w, s, pads, True), x, w)
    ct = jnp.asarray(rs.randn(*yr.shape), jnp.float32)
    gr, gm = vjp_ref(ct), vjp_mine(ct)
    np.testing.assert_allclose(np.asarray(gm[0]), np.asarray(gr[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gm[1]), np.asarray(gr[1]),
                               rtol=1e-5, atol=1e-4)


def test_b0_pallas_backend_grads_match():
    """End-to-end B0 (64px): the pallas dw_backend must produce the same
    loss gradients as the XLA grouped-conv backend."""
    model_c = efficientnet_b0(3, dtype=jnp.float32, dw_backend="conv")
    model_p = efficientnet_b0(3, dtype=jnp.float32, dw_backend="pallas")
    x = jnp.asarray(np.random.RandomState(3).randn(2, 64, 64, 3),
                    jnp.float32)
    variables = model_c.init(jax.random.PRNGKey(0), x, train=False)

    def loss(m):
        def f(params):
            (feat, logits), _ = m.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(logits ** 2)
        return f

    gc = jax.grad(loss(model_c))(variables["params"])
    gp = jax.grad(loss(model_p))(variables["params"])
    flat_c = jax.tree_util.tree_leaves_with_path(gc)
    flat_p = {jax.tree_util.keystr(kp): v
              for kp, v in jax.tree_util.tree_leaves_with_path(gp)}
    for kp, v in flat_c:
        np.testing.assert_allclose(
            np.asarray(flat_p[jax.tree_util.keystr(kp)]), np.asarray(v),
            rtol=2e-2, atol=2e-3, err_msg=jax.tree_util.keystr(kp))


@pytest.mark.parametrize("k,s,hw,c", [
    (3, 1, 14, 8), (3, 2, 15, 8), (5, 1, 14, 16), (5, 2, 14, 16),
    (3, 2, 14, 8),
])
def test_dense_matches_grouped_conv(k, s, hw, c):
    from fedmlp_tpu.ops.depthwise import depthwise_dense

    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, hw, hw, c), jnp.float32)
    w = jnp.asarray(rs.randn(k, k, 1, c), jnp.float32)
    pads = (_same_pads(hw, k, s), _same_pads(hw, k, s))
    ref = jax.lax.conv_general_dilated(
        x, w, (s, s), padding=list(pads),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    got = depthwise_dense(x, w, s, pads)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dense_gradients_match():
    from fedmlp_tpu.ops.depthwise import depthwise_dense

    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 9, 9, 4), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 1, 4), jnp.float32)
    pads = (_same_pads(9, 3, 2), _same_pads(9, 3, 2))

    def f_ref(x, w):
        return (jax.lax.conv_general_dilated(
            x, w, (2, 2), padding=list(pads),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=4) ** 2).sum()

    def f_dense(x, w):
        return (depthwise_dense(x, w, 2, pads) ** 2).sum()

    gr = jax.grad(f_ref, argnums=(0, 1))(x, w)
    gd = jax.grad(f_dense, argnums=(0, 1))(x, w)
    for a, b in zip(gr, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_effnet_dense_backend_forward_matches_conv():
    """Whole-model check: dw_backend='dense' == 'conv' forward bitwise-ish
    (same params; dense adds exact-zero taps only)."""
    import jax.random as jr
    from fedmlp_tpu.models import build_model
    from fedmlp_tpu.models.factory import init_model

    m_conv = build_model("efficient_b0", 4, compute_dtype=jnp.float32)
    m_dense = build_model("efficient_b0", 4, compute_dtype=jnp.float32,
                          dw_backend="dense")
    v = init_model(m_conv, jr.PRNGKey(0), 64, batch=2)
    x = jnp.asarray(np.random.RandomState(5).rand(2, 64, 64, 3), jnp.float32)
    f1, l1 = m_conv.apply(v, x, train=False)
    f2, l2 = m_dense.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,s,hw,c", [(3, 1, 14, 8), (3, 2, 15, 8),
                                      (5, 2, 14, 16)])
def test_reroute_forward_and_gradients_match(k, s, hw, c):
    """ops/dw_conv.py::dw_conv (rerouted backward: dx via the forward
    emitter, dw via strided-shift taps) == the native VJP."""
    from fedmlp_tpu.ops.dw_conv import dw_conv, dw_conv_xla

    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(2, hw, hw, c), jnp.float32)
    w = jnp.asarray(rs.randn(k, k, 1, c), jnp.float32)
    pads = (_same_pads(hw, k, s), _same_pads(hw, k, s))

    np.testing.assert_allclose(
        np.asarray(dw_conv(x, w, s, pads)),
        np.asarray(dw_conv_xla(x, w, s, pads)), rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda x, w: (fn(x, w, s, pads) ** 2).sum()

    gr = jax.grad(loss(dw_conv_xla), argnums=(0, 1))(x, w)
    gg = jax.grad(loss(dw_conv), argnums=(0, 1))(x, w)
    for a, b in zip(gr, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
