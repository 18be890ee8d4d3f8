"""EfficientNet B0–B7, NHWC, bf16-friendly.

Same compound-scaling family the reference pulls from efficientnet-pytorch
(reference: model/efficientnet.py:28-89, model/all_models.py:79-94). The
bench flagship is Efficient_b0 (BASELINE.json). Feature = GAP of the 1280·w
head conv output; forward returns (feature, logits).

Fidelity notes vs efficientnet-pytorch (lukemelas):
* stride-2 convs use TF-"SAME" asymmetric padding (pad more on the
  right/bottom), matching Conv2dStaticSamePadding — required for converted
  ImageNet weights to agree numerically;
* dropout (variant rate) on the pooled feature and per-block stochastic
  depth (drop_connect_rate=0.2 scaled by block index) are active in train
  mode when a 'dropout' rng stream is provided (the engine's apply_train
  threads one); without the stream they are no-ops, so eval and rng-less
  callers are deterministic.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from fedmlp_tpu.models.heads import FCNormHead, LinearHead

# dw_backend='dense': channel cap above which blocks keep the grouped
# form (the k²·C² dense MACs stop being free around C≳200 at B0's
# spatial sizes — 240²@28² is ~0.5 TFLOP/step at flagship scale)
import os as _os

_DENSE_DW_MAX_CH = int(_os.environ.get("FEDMLP_DW_DENSE_MAXCH", "192"))

# (expand_ratio, channels, repeats, stride, kernel)
_B0_BLOCKS = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)
# (width_mult, depth_mult, resolution, dropout)
_SCALING = {
    "b0": (1.0, 1.0, 224, 0.2),
    "b1": (1.0, 1.1, 240, 0.2),
    "b2": (1.1, 1.2, 260, 0.3),
    "b3": (1.2, 1.4, 300, 0.3),
    "b4": (1.4, 1.8, 380, 0.4),
    "b5": (1.6, 2.2, 456, 0.4),
    "b6": (1.8, 2.6, 528, 0.5),
    "b7": (2.0, 3.1, 600, 0.5),
}


def _round_filters(filters: int, width_mult: float, divisor: int = 8) -> int:
    filters *= width_mult
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def _round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


def _same_pads(n: int, k: int, s: int):
    """TF-SAME padding for one spatial dim (Conv2dStaticSamePadding)."""
    out = -(-n // s)  # ceil
    total = max(0, (out - 1) * s + k - n)
    return (total // 2, total - total // 2)


def _drop_connect(h, rate, rng):
    """Per-sample stochastic depth (efficientnet-pytorch ``drop_connect``)."""
    keep = 1.0 - rate
    mask = jnp.floor(
        keep + jax.random.uniform(rng, (h.shape[0], 1, 1, 1), jnp.float32)
    ).astype(h.dtype)
    return h / keep * mask


class MBConv(nn.Module):
    in_ch: int
    out_ch: int
    expand: int
    kernel: int
    stride: int
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.bfloat16
    norm: Any = None
    drop_rate: float = 0.0  # stochastic depth, scaled by global block index
    # 'conv' (XLA grouped conv) | 'taps' (VPU shifts) | 'pallas' (XLA
    # forward + Pallas flat-shift backward, ops/dw_pallas.py)
    dw_backend: str = "conv"

    @nn.compact
    def __call__(self, x, stochastic: bool = False):
        conv = partial(nn.Conv, dtype=self.dtype, use_bias=False)
        h = x
        mid = self.in_ch * self.expand
        if self.expand != 1:
            h = conv(mid, (1, 1), name="expand_conv")(h)
            h = self.norm(name="expand_bn")(h)
            h = nn.swish(h)
        k, s = self.kernel, self.stride
        dw_pads = (_same_pads(h.shape[1], k, s), _same_pads(h.shape[2], k, s))
        if self.dw_backend == "taps":
            from fedmlp_tpu.ops.depthwise import DepthwiseTaps

            h = DepthwiseTaps(mid, k, s, dw_pads, dtype=self.dtype,
                              name="dw_conv")(h)
        elif self.dw_backend == "pallas":
            from fedmlp_tpu.ops.depthwise import DepthwisePallas

            h = DepthwisePallas(mid, k, s, dw_pads, dtype=self.dtype,
                                name="dw_conv")(h)
        elif self.dw_backend == "reroute":
            from fedmlp_tpu.ops.depthwise import DepthwiseReroute

            h = DepthwiseReroute(mid, k, s, dw_pads, dtype=self.dtype,
                                 name="dw_conv")(h)
        elif self.dw_backend == "dense" and mid <= _DENSE_DW_MAX_CH:
            # diagonal-masked dense conv: routes the depthwise BACKWARD
            # through XLA's standard conv emitter (the grouped-conv VJP
            # moves ~12x its operand bytes on TPU — ops/depthwise.py::
            # depthwise_dense). Capped to small-C blocks where the k²·C²
            # extra MACs stay far below the program's idle MXU headroom.
            from fedmlp_tpu.ops.depthwise import DepthwiseDense

            h = DepthwiseDense(mid, k, s, dw_pads, dtype=self.dtype,
                               name="dw_conv")(h)
        else:
            h = nn.Conv(
                mid, (k, k), (s, s), padding=list(dw_pads),
                feature_group_count=mid,
                use_bias=False, dtype=self.dtype, name="dw_conv",
            )(h)
        h = self.norm(name="dw_bn")(h)
        h = nn.swish(h)
        # squeeze-excite on pre-expansion channel count
        se_ch = max(1, int(self.in_ch * self.se_ratio))
        s = h.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(se_ch, (1, 1), dtype=self.dtype, name="se_reduce")(s)
        s = nn.swish(s)
        s = nn.Conv(mid, (1, 1), dtype=self.dtype, name="se_expand")(s)
        h = h * nn.sigmoid(s)
        h = conv(self.out_ch, (1, 1), name="project_conv")(h)
        h = self.norm(name="project_bn")(h)
        if self.stride == 1 and self.in_ch == self.out_ch:
            if stochastic and self.drop_rate > 0:
                h = _drop_connect(h, self.drop_rate, self.make_rng("dropout"))
            h = h + x
        return h


class EfficientNet(nn.Module):
    width_mult: float
    depth_mult: float
    num_classes: int
    dtype: jnp.dtype = jnp.bfloat16
    normed_head: bool = False
    blocks: Sequence = _B0_BLOCKS
    dropout_p: float = 0.2        # variant rate (set by the factory)
    drop_connect_rate: float = 0.2  # lukemelas global_params default
    dw_backend: str = "conv"      # see MBConv.dw_backend
    # Rematerialize each MBConv block in the backward pass: only block
    # INPUTS are saved as residuals; the 6x-expanded internals (expand/dw/
    # SE activations) are recomputed during the gradient. Pure byte
    # reduction for the HBM-bandwidth-bound training step at ~+1/3 forward
    # FLOPs (idle on this slice: 8 of ~200 TFLOP/s achieved). prevent_cse
    # is off — the step runs inside lax.scan/lax.map where XLA CSE across
    # the remat boundary is not a hazard and the barrier costs scheduling.
    remat: bool = False
    # Selective remat: stage indices (bi into ``blocks``) to rematerialize
    # when ``remat`` is off. The early stages carry the byte-fat 112/56 px
    # activations whose backward reads are lane-padding-inflated (see
    # BENCH_NOTES round-4 HLO study) — restricting remat to them buys the
    # byte reduction where it pays without re-running the cheap deep convs.
    remat_stages: Sequence[int] = ()

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.99,  # torch momentum 0.01
            epsilon=1e-3,
            dtype=self.dtype,
        )
        stochastic = train and self.has_rng("dropout")
        x = x.astype(self.dtype)
        stem = _round_filters(32, self.width_mult)
        x = nn.Conv(stem, (3, 3), (2, 2),
                    padding=[_same_pads(x.shape[1], 3, 2),
                             _same_pads(x.shape[2], 3, 2)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.swish(x)
        in_ch = stem
        n_blocks = sum(_round_repeats(reps, self.depth_mult)
                       for _, _, reps, _, _ in self.blocks)
        # static_argnums=(2,): (self, x, stochastic) — the python-bool
        # branch flag must stay compile-time static under the lift
        remat_cls = nn.remat(MBConv, static_argnums=(2,), prevent_cse=False)
        gi = 0  # global block index scales the stochastic-depth rate
        for bi, (expand, ch, reps, stride, kernel) in enumerate(self.blocks):
            out_ch = _round_filters(ch, self.width_mult)
            block_cls = (remat_cls if self.remat
                         or bi in tuple(self.remat_stages) else MBConv)
            for r in range(_round_repeats(reps, self.depth_mult)):
                x = block_cls(
                    in_ch=in_ch,
                    out_ch=out_ch,
                    expand=expand,
                    kernel=kernel,
                    stride=stride if r == 0 else 1,
                    dtype=self.dtype,
                    norm=norm,
                    drop_rate=self.drop_connect_rate * gi / n_blocks,
                    dw_backend=self.dw_backend,
                    name=f"block{bi}_{r}",
                )(x, stochastic)  # positional: arg 2 is static under remat
                in_ch = out_ch
                gi += 1
        head_ch = _round_filters(1280, self.width_mult)
        x = nn.Conv(head_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(x)
        x = norm(name="head_bn")(x)
        x = nn.swish(x)
        feature = x.mean(axis=(1, 2)).astype(jnp.float32)
        feature = nn.Dropout(self.dropout_p, name="dropout")(
            feature, deterministic=not stochastic
        )
        head = (FCNormHead if self.normed_head else LinearHead)(
            self.num_classes, name="head"
        )
        return feature, head(feature)


def _make(variant):
    def ctor(num_classes, **kw):
        w, d, _res, drop = _SCALING[variant]
        kw.setdefault("dropout_p", drop)
        return EfficientNet(w, d, num_classes, **kw)

    ctor.__name__ = f"efficientnet_{variant}"
    return ctor


efficientnet_b0 = _make("b0")
efficientnet_b1 = _make("b1")
efficientnet_b2 = _make("b2")
efficientnet_b3 = _make("b3")
efficientnet_b4 = _make("b4")
efficientnet_b5 = _make("b5")
efficientnet_b6 = _make("b6")
efficientnet_b7 = _make("b7")


def feature_dim(variant: str) -> int:
    w = _SCALING[variant][0]
    return _round_filters(1280, w)
