"""EfficientNet B0–B7, NHWC, bf16-friendly.

Same compound-scaling family the reference pulls from efficientnet-pytorch
(reference: model/efficientnet.py:28-89, model/all_models.py:79-94). The
bench flagship is Efficient_b0 (BASELINE.json). Feature = GAP of the 1280·w
head conv output; forward returns (feature, logits).

Stochastic depth / dropout are exposed but default off: the reference runs
these models in a federated loop where per-step RNG is owned by the caller;
pass ``deterministic=False`` plus an rng to enable.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from fedmlp_tpu.models.heads import FCNormHead, LinearHead

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


class MBConv(nn.Module):
    in_ch: int
    out_ch: int
    expand: int
    kernel: int
    stride: int
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.bfloat16
    norm: Any = None

    @nn.compact
    def __call__(self, x):
        conv = partial(nn.Conv, dtype=self.dtype, use_bias=False)
        h = x
        mid = self.in_ch * self.expand
        if self.expand != 1:
            h = conv(mid, (1, 1), name="expand_conv")(h)
            h = self.norm(name="expand_bn")(h)
            h = nn.swish(h)
        pad = self.kernel // 2
        h = nn.Conv(
            mid, (self.kernel, self.kernel), (self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)], feature_group_count=mid,
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
            h = h + x
        return h


class EfficientNet(nn.Module):
    width_mult: float
    depth_mult: float
    num_classes: int
    dtype: jnp.dtype = jnp.bfloat16
    normed_head: bool = False
    blocks: Sequence = _B0_BLOCKS

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.99,  # torch momentum 0.01
            epsilon=1e-3,
            dtype=self.dtype,
        )
        x = x.astype(self.dtype)
        stem = _round_filters(32, self.width_mult)
        x = nn.Conv(stem, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.swish(x)
        in_ch = stem
        for bi, (expand, ch, reps, stride, kernel) in enumerate(self.blocks):
            out_ch = _round_filters(ch, self.width_mult)
            for r in range(_round_repeats(reps, self.depth_mult)):
                x = MBConv(
                    in_ch=in_ch,
                    out_ch=out_ch,
                    expand=expand,
                    kernel=kernel,
                    stride=stride if r == 0 else 1,
                    dtype=self.dtype,
                    norm=norm,
                    name=f"block{bi}_{r}",
                )(x)
                in_ch = out_ch
        head_ch = _round_filters(1280, self.width_mult)
        x = nn.Conv(head_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(x)
        x = norm(name="head_bn")(x)
        x = nn.swish(x)
        feature = x.mean(axis=(1, 2)).astype(jnp.float32)
        head = (FCNormHead if self.normed_head else LinearHead)(
            self.num_classes, name="head"
        )
        return feature, head(feature)


def _make(variant):
    def ctor(num_classes, **kw):
        w, d, _res, _drop = _SCALING[variant]
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
