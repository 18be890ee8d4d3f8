"""Channel-stacked lockstep execution of K per-client models.

The reference trains its clients strictly one-after-another on a single
GPU (reference: main.py:135-197). Round 1 of this rebuild ran them as a
``lax.map`` over a stacked [K, ...] parameter pytree — K sequential small
programs. Profiling the bench round (BENCH_NOTES.md) showed that at batch
32 EfficientNet-B0's early layers (C = 16..144) underfill both the TPU's
128-wide vector lanes and the MXU's 128-deep contraction, and the
backward convolutions dominate the step.

This module executes all K clients as ONE network whose layers are
K×-wide *grouped* ops — the TPU-native formulation of lockstep federated
clients on a single chip:

  * depthwise convs: K per-client depthwise convs of C channels are ONE
    depthwise conv of K·C channels (feature_group_count = K·C) —
    per-channel ops are client-agnostic, so stacking is exact;
  * pointwise (1×1) convs / dense heads: per-client weight matrices
    become one MXU *batched* matmul over a K batch dim
    (einsum 'bhwkc,kcd->bhwkd');
  * dense k×k convs (stem, SmallCNN): block-diagonal grouped conv with
    feature_group_count = K;
  * BatchNorm: per-client BN of C channels IS per-channel BN of the
    stacked K·C channels — exact by construction.

Parameters stay in the engine's stacked layout (every leaf [K, *shape],
the same pytree `broadcast_to_clients` produces), so aggregation,
checkpointing, and the lax.map path are all interchangeable with this
one. Numerical equivalence with the lax.map path is asserted in
tests/test_stacked.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from fedmlp_tpu.models.efficientnet import (EfficientNet, _round_filters,
                                            _round_repeats, _same_pads)
from fedmlp_tpu.models.smallcnn import SmallCNN


def supports_stacking(model) -> bool:
    return isinstance(model, (EfficientNet, SmallCNN))


# ----------------------------------------------------------------------
# Stacked primitive ops. `K` is the client-stack width; activations are
# [B, H, W, K*C] with k-major channel blocks (client k owns channels
# [k*C:(k+1)*C]); parameters are [K, *per_client_shape].
# ----------------------------------------------------------------------


def _grouped_conv(x, w_k, stride, pads, dtype):
    """Block-diagonal dense conv: per-client [kh,kw,Ci,Co] kernels run as
    one conv with feature_group_count=K. x [B,H,W,K*Ci], w_k [K,kh,kw,Ci,Co]
    → [B,H,W,K*Co]."""
    K = w_k.shape[0]
    kh, kw, ci, co = w_k.shape[1:]
    # group k of the output must read input channels [k*Ci:(k+1)*Ci] and
    # produce output channels [k*Co:(k+1)*Co] → out-channel-major K
    rhs = jnp.transpose(w_k, (1, 2, 3, 0, 4)).reshape(kh, kw, ci, K * co)
    return jax.lax.conv_general_dilated(
        x, rhs.astype(dtype), (stride, stride), list(pads),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=K,
    )


def _depthwise_conv(x, w_k, stride, pads, dtype):
    """K per-client depthwise convs as one depthwise conv of K*C channels.
    x [B,H,W,K*C], w_k [K,kh,kw,1,C] → [B,H,W,K*C]."""
    K = w_k.shape[0]
    kh, kw, _, c = w_k.shape[1:]
    rhs = jnp.transpose(w_k, (1, 2, 3, 0, 4)).reshape(kh, kw, 1, K * c)
    return jax.lax.conv_general_dilated(
        x, rhs.astype(dtype), (stride, stride), list(pads),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=K * c,
    )


def _build_bd(w_k, dtype):
    """[K,Ci,Co] per-client weights → [K*Ci, K*Co] block-diagonal matrix."""
    K, ci, co = w_k.shape
    eye = jnp.eye(K, dtype=dtype)
    return jnp.einsum("kcd,kl->kcld", w_k.astype(dtype), eye).reshape(
        K * ci, K * co)


@jax.custom_vjp
def _bd_matmul(x2d, w_k):
    """x2d [R, K*Ci] @ blockdiag(w_k [K,Ci,Co]) → [R, K*Co].

    Custom VJP because XLA's autodiff wgrad (dot contracting over the R
    rows) materializes a transposed copy of whichever operand it fancies —
    measured as a 616 MB flops=0 transpose of the GRADIENT per early layer.
    Here the wgrad explicitly transposes the smaller of (x, g) and runs a
    plain NN matmul, then extracts the diagonal blocks."""
    bd = _build_bd(w_k, x2d.dtype)
    return jax.lax.dot_general(
        x2d, bd, (((1,), (0,)), ((), ())), preferred_element_type=x2d.dtype)


def _bd_matmul_fwd(x2d, w_k):
    return _bd_matmul(x2d, w_k), (x2d, w_k)


def _bd_matmul_bwd(res, g):
    x2d, w_k = res
    K, ci, co = w_k.shape
    bd = _build_bd(w_k, x2d.dtype)
    # dx: [R, K*Co] x [K*Ci, K*Co]^T — NT matmul, no materialized transpose
    dx = jax.lax.dot_general(
        g, bd, (((1,), (1,)), ((), ())), preferred_element_type=x2d.dtype)
    eye = jnp.eye(K)
    if ci <= co:
        xT = x2d.T  # transpose the SMALLER operand
        dense = jax.lax.dot_general(
            xT, g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [K*Ci, K*Co]
        dw = jnp.einsum("kcld,kl->kcd", dense.reshape(K, ci, K, co), eye)
    else:
        gT = g.T
        denseT = jax.lax.dot_general(
            gT, x2d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [K*Co, K*Ci]
        dw = jnp.einsum("ldkc,lk->kcd", denseT.reshape(K, co, K, ci), eye)
    return dx, dw.astype(w_k.dtype)


_bd_matmul.defvjp(_bd_matmul_fwd, _bd_matmul_bwd)


def _pointwise(x, w_k, b_k, dtype):
    """Per-client 1×1 conv on the fixed [B,H,W,K*C] layout.

    A K-batched einsum ('bhwkc,kcd->bhwkd') is algebraically cleanest but
    forces XLA to transpose k to a leading batch dim and back around EVERY
    layer (measured 18.4 ms/step of pure data formatting in the full net).
    Two zero-relayout forms remain, chosen per layer by a static cost
    model (shapes are trace-time constants):

      * block-diagonal dense matmul — K× dead FLOPs on the MXU, but the
        cleanest lowering; wins while the matmul stays bandwidth-bound;
      * grouped conv (feature_group_count=K) — minimal FLOPs, ~1.6×
        lowering overhead; wins once K× dead FLOPs would dominate.
    """
    K = w_k.shape[0]
    if w_k.ndim == 5:
        w_k = w_k[:, 0, 0]
    ci, co = w_k.shape[1:]
    B, H, W, _ = x.shape
    rows = B * H * W
    # fwd+bwd ≈ 3 matmuls; bytes ≈ read x + write y (+ grad mirror images)
    flops_bd = 3 * 2.0 * rows * (K * ci) * (K * co)
    flops_gr = 3 * 2.0 * rows * K * ci * co
    bytes_xy = 3 * 2.0 * rows * K * (ci + co)
    t_bd = max(bytes_xy / 8e11, flops_bd / 1.6e14)
    t_gr = 1.6 * max(bytes_xy / 8e11, flops_gr / 1.6e14)
    if t_bd <= t_gr:
        y = _bd_matmul(x.reshape(-1, K * ci), w_k.astype(dtype))
        y = y.reshape(B, H, W, K * co)
    else:
        rhs = jnp.transpose(w_k, (1, 0, 2)).reshape(1, 1, ci, K * co)
        y = jax.lax.conv_general_dilated(
            x, rhs.astype(dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=K)
    if b_k is not None:
        y = y + b_k.reshape(K * co).astype(dtype)
    return y


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bn_train_core(x, scale, bias, eps):
    """Training-mode BN over the last axis: y plus batch (mean, var) in f32.

    Custom VJP with the analytic BN backward: XLA's autodiff of the
    stats path materializes f32 cotangent copies of the full activation
    (measured ~6.5 ms/step of add_any at B0 scale); the closed form needs
    only two channel reductions over (g, g·x̂) and one elementwise pass.

    CONTRACT: the (mean, var) outputs are EMA side-channels — their
    cotangents are ignored in the backward. Do not differentiate through
    them (the engine never does: new batch_stats ride the has_aux path)."""
    y, mean, var, _ = _bn_train_impl(x, scale, bias, eps)
    return y, mean, var


def _bn_train_impl(x, scale, bias, eps):
    dtype = x.dtype
    mean = jnp.mean(x, axis=tuple(range(x.ndim - 1)), dtype=jnp.float32)
    mean2 = jnp.mean(jnp.square(x.astype(jnp.float32)),
                     axis=tuple(range(x.ndim - 1)))
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    rsig = jax.lax.rsqrt(var + eps).astype(dtype)  # flax adds eps in dtype
    y = (x - mean.astype(dtype)) * (rsig * scale.astype(dtype)) \
        + bias.astype(dtype)
    return y, mean, var, rsig


def _bn_train_fwd(x, scale, bias, eps):
    y, mean, var, rsig = _bn_train_impl(x, scale, bias, eps)
    return (y, mean, var), (x, mean, rsig, scale)


def _bn_train_bwd(eps, res, cts):
    g, _g_mean, _g_var = cts  # stats cotangents ignored (see contract)
    x, mean, rsig, scale = res
    dtype = x.dtype
    axes = tuple(range(x.ndim - 1))
    n = 1.0
    for a in axes:
        n *= x.shape[a]
    xhat = (x - mean.astype(dtype)) * rsig
    dbias = jnp.sum(g, axis=axes, dtype=jnp.float32)
    dscale = jnp.sum(g * xhat, axis=axes, dtype=jnp.float32)
    coef = (scale.astype(jnp.float32) * rsig.astype(jnp.float32))
    dx = coef.astype(dtype) * (
        g - (dbias / n).astype(dtype) - xhat * (dscale / n).astype(dtype)
    )
    return dx, dscale, dbias


_bn_train_core.defvjp(_bn_train_fwd, _bn_train_bwd)


def _batchnorm(x, scale_k, bias_k, stats_k, train, momentum, eps, dtype):
    """Per-channel BN over the stacked K*C channel axis — flax
    nn.BatchNorm semantics (stats in f32, E[x²]−E[x]² variance, EMA
    update with `momentum`). Returns (y, new_stats {mean, var} [K,C])."""
    KC = x.shape[-1]
    scale = scale_k.reshape(KC).astype(jnp.float32)
    bias = bias_k.reshape(KC).astype(jnp.float32)
    if train:
        y, mean, var = _bn_train_core(x.astype(dtype), scale, bias, eps)
        # the custom VJP ignores the stats cotangents (see contract above);
        # make that non-differentiability explicit in the graph so a future
        # caller differentiating a stats-derived loss gets zeros by
        # construction instead of silently wrong gradients
        mean = jax.lax.stop_gradient(mean)
        var = jax.lax.stop_gradient(var)
        kshape = stats_k["mean"].shape
        new_stats = {
            "mean": momentum * stats_k["mean"] + (1 - momentum) * mean.reshape(kshape),
            "var": momentum * stats_k["var"] + (1 - momentum) * var.reshape(kshape),
        }
        return y, new_stats
    mean = stats_k["mean"].reshape(KC).astype(jnp.float32)
    var = stats_k["var"].reshape(KC).astype(jnp.float32)
    # normalization math runs in the compute dtype, exactly like flax's
    # _normalize (promote_dtype(..., dtype=self.dtype))
    y = (x.astype(dtype) - mean.astype(dtype)) * jax.lax.rsqrt(
        var.astype(dtype) + jnp.asarray(eps, dtype)
    ) * scale.astype(dtype) + bias.astype(dtype)
    return y, stats_k


def _stack_in(x):
    """[K,B,H,W,C] → [B,H,W,K*C] (k-major channel blocks)."""
    K, B, H, W, C = x.shape
    return jnp.transpose(x, (1, 2, 3, 0, 4)).reshape(B, H, W, K * C)


def _unstack_vec(x, K):
    """[B, K*D] → [K, B, D]."""
    B = x.shape[0]
    return jnp.transpose(x.reshape(B, K, -1), (1, 0, 2))


# ----------------------------------------------------------------------
# EfficientNet stacked forward
# ----------------------------------------------------------------------


def _mbconv_stacked(p, st, x, *, K, in_ch, out_ch, expand, kernel, stride,
                    train, norm_args, dtype, drop_rate, rng):
    new_st = {}
    h = x
    mid = in_ch * expand
    if expand != 1:
        h = _pointwise(h, p["expand_conv"]["kernel"], None, dtype)
        h, new_st["expand_bn"] = _batchnorm(
            h, p["expand_bn"]["scale"], p["expand_bn"]["bias"],
            st["expand_bn"], train, *norm_args, dtype)
        h = jax.nn.swish(h)
    k, s = kernel, stride
    Hc = h.shape[1]
    pads = (_same_pads(Hc, k, s), _same_pads(h.shape[2], k, s))
    h = _depthwise_conv(h, p["dw_conv"]["kernel"], s, pads, dtype)
    h, new_st["dw_bn"] = _batchnorm(
        h, p["dw_bn"]["scale"], p["dw_bn"]["bias"], st["dw_bn"],
        train, *norm_args, dtype)
    h = jax.nn.swish(h)
    # squeeze-excite (per-client channel mixing → K-batched matmuls)
    B, Hh, Ww, _ = h.shape
    se = h.reshape(B, Hh, Ww, K, mid).mean(axis=(1, 2))  # [B, K, mid]
    se = jnp.einsum("bkc,kcd->bkd", se,
                    p["se_reduce"]["kernel"][:, 0, 0].astype(dtype))
    se = se + p["se_reduce"]["bias"].astype(dtype)
    se = jax.nn.swish(se)
    se = jnp.einsum("bkc,kcd->bkd", se,
                    p["se_expand"]["kernel"][:, 0, 0].astype(dtype))
    se = se + p["se_expand"]["bias"].astype(dtype)
    gate = jax.nn.sigmoid(se).reshape(B, 1, 1, K * mid)
    h = h * gate
    h = _pointwise(h, p["project_conv"]["kernel"], None, dtype)
    h, new_st["project_bn"] = _batchnorm(
        h, p["project_bn"]["scale"], p["project_bn"]["bias"],
        st["project_bn"], train, *norm_args, dtype)
    if stride == 1 and in_ch == out_ch:
        if rng is not None and drop_rate > 0:
            keep = 1.0 - drop_rate
            u = jax.random.uniform(rng, (B, 1, 1, K, 1), jnp.float32)
            mask = jnp.floor(keep + u).astype(h.dtype)
            h5 = h.reshape(B, Hh, Ww, K, out_ch) / keep * mask
            h = h5.reshape(B, Hh, Ww, K * out_ch)
        h = h + x
    return h, new_st


def _efficientnet_stacked(model: EfficientNet, variables, x, train, rng):
    params, stats = variables["params"], variables["batch_stats"]
    K = x.shape[0]
    dtype = model.dtype
    norm_args = (0.99, 1e-3)  # momentum, eps — models/efficientnet.py:139-144
    h = _stack_in(x.astype(dtype))
    new_stats = {}
    if rng is not None and train:
        rng_sd, rng_do = jax.random.split(rng)
    else:
        rng_sd = rng_do = None

    stem = _round_filters(32, model.width_mult)
    pads = (_same_pads(h.shape[1], 3, 2), _same_pads(h.shape[2], 3, 2))
    h = _grouped_conv(h, params["stem_conv"]["kernel"], 2, pads, dtype)
    h, new_stats["stem_bn"] = _batchnorm(
        h, params["stem_bn"]["scale"], params["stem_bn"]["bias"],
        stats["stem_bn"], train, *norm_args, dtype)
    h = jax.nn.swish(h)

    in_ch = stem
    n_blocks = sum(_round_repeats(reps, model.depth_mult)
                   for _, _, reps, _, _ in model.blocks)
    gi = 0
    for bi, (expand, ch, reps, stride, kernel) in enumerate(model.blocks):
        out_ch = _round_filters(ch, model.width_mult)
        for r in range(_round_repeats(reps, model.depth_mult)):
            name = f"block{bi}_{r}"
            drop = model.drop_connect_rate * gi / n_blocks
            blk_rng = (jax.random.fold_in(rng_sd, gi)
                       if rng_sd is not None else None)
            h, new_stats[name] = _mbconv_stacked(
                params[name], stats[name], h, K=K, in_ch=in_ch,
                out_ch=out_ch, expand=expand, kernel=kernel,
                stride=stride if r == 0 else 1, train=train,
                norm_args=norm_args, dtype=dtype, drop_rate=drop,
                rng=blk_rng)
            in_ch = out_ch
            gi += 1

    h = _pointwise(h, params["head_conv"]["kernel"], None, dtype)
    h, new_stats["head_bn"] = _batchnorm(
        h, params["head_bn"]["scale"], params["head_bn"]["bias"],
        stats["head_bn"], train, *norm_args, dtype)
    h = jax.nn.swish(h)
    B = h.shape[0]
    head_ch = _round_filters(1280, model.width_mult)
    feature = h.reshape(B, h.shape[1], h.shape[2], K, head_ch).mean(
        axis=(1, 2)).astype(jnp.float32)  # [B, K, D]
    if rng_do is not None and model.dropout_p > 0:
        keep = 1.0 - model.dropout_p
        mask = jax.random.bernoulli(rng_do, keep, feature.shape)
        feature = jnp.where(mask, feature / keep, 0.0)
    logits = _head_stacked(model, params["head"], feature)
    return ((jnp.transpose(feature, (1, 0, 2)),
             jnp.transpose(logits, (1, 0, 2))),
            new_stats if train else None)


def _head_stacked(model, p, feature):
    """feature [B,K,D] → logits [B,K,n]. Mirrors heads.LinearHead /
    heads.FCNormHead (s=30 cosine head)."""
    if model.normed_head:
        w = p["weight"] - 1.0  # [K, D, n] — heads.py U(0,2)→U(-1,1) shift
        xn = feature / jnp.maximum(
            jnp.linalg.norm(feature, axis=-1, keepdims=True), 1e-12)
        wn = w / jnp.maximum(jnp.linalg.norm(w, axis=1, keepdims=True), 1e-12)
        return 30.0 * jnp.einsum("bkd,kdn->bkn", xn, wn.astype(xn.dtype))
    w = p["fc"]["kernel"]  # [K, D, n]
    b = p["fc"]["bias"]  # [K, n]
    return jnp.einsum("bkd,kdn->bkn", feature, w.astype(feature.dtype)) + b


# ----------------------------------------------------------------------
# SmallCNN stacked forward (CPU-fast equivalence testing)
# ----------------------------------------------------------------------


def _smallcnn_stacked(model: SmallCNN, variables, x, train, rng):
    params, stats = variables["params"], variables["batch_stats"]
    K = x.shape[0]
    dtype = model.dtype
    norm_args = (0.9, 1e-5)  # models/smallcnn.py:27
    h = _stack_in(x.astype(dtype))
    new_stats = {}
    for i in range(3):
        h = _grouped_conv(h, params[f"conv{i}"]["kernel"], 2,
                          ((1, 1), (1, 1)), dtype)
        h, new_stats[f"bn{i}"] = _batchnorm(
            h, params[f"bn{i}"]["scale"], params[f"bn{i}"]["bias"],
            stats[f"bn{i}"], train, *norm_args, dtype)
        h = jax.nn.relu(h)
    B = h.shape[0]
    feature = h.reshape(B, h.shape[1], h.shape[2], K, -1).mean(
        axis=(1, 2)).astype(jnp.float32)
    logits = _head_stacked(model, params["head"], feature)
    return ((jnp.transpose(feature, (1, 0, 2)),
             jnp.transpose(logits, (1, 0, 2))),
            new_stats if train else None)


# ----------------------------------------------------------------------
# Public API
# ----------------------------------------------------------------------


def stacked_apply(model, variables, x, train=True, rng=None):
    """Run K clients' forwards in lockstep.

    variables: the engine's stacked pytree (every leaf [K, ...]).
    x: [K, B, H, W, 3] float views.
    Returns ((feature [K,B,D], logits [K,B,n]), new_batch_stats|None).
    """
    if isinstance(model, EfficientNet):
        return _efficientnet_stacked(model, variables, x, train, rng)
    if isinstance(model, SmallCNN):
        return _smallcnn_stacked(model, variables, x, train, rng)
    raise NotImplementedError(
        f"stacked execution unsupported for {type(model).__name__}")
