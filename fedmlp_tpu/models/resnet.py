"""ResNet family (18/34/50/101/152), NHWC, bf16-friendly.

Matches torchvision's resnet topology (the reference builds Resnet18..152
via torchvision, reference: model/all_models.py:53-62) with the explicit
``(feature, logits)`` contract: feature is the global-average-pooled
penultimate activation (512 for ResNet18/34, 2048 for 50/101/152 —
reference --feature_dim, utils/options.py:22-23).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

from fedmlp_tpu.models.heads import FCNormHead, LinearHead

ModuleDef = Any


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    se_ratio: float = 0.0  # >0 enables the squeeze-excite variant (SENet)

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides),
                      padding=[(1, 1), (1, 1)], use_bias=False)(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False)(y)
        y = self.norm()(y)
        if self.se_ratio > 0:
            y = squeeze_excite(y, self.se_ratio, self.conv)
        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1),
                                 (self.strides, self.strides),
                                 use_bias=False, name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


def squeeze_excite(y, ratio, conv):
    """SE block (used by the SENet family, reference: model/all_models.py:71-78
    pulls se_resnet50/101/152 + senet154 from pretrainedmodels)."""
    ch = y.shape[-1]
    hidden = max(1, int(ch * ratio))
    s = y.mean(axis=(1, 2), keepdims=True)
    s = conv(hidden, (1, 1), name="se_reduce")(s)
    s = nn.relu(s)
    s = conv(ch, (1, 1), name="se_expand")(s)
    return y * nn.sigmoid(s)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    se_ratio: float = 0.0

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1), use_bias=False)(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides),
                      padding=[(1, 1), (1, 1)], use_bias=False)(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters * 4, (1, 1), use_bias=False)(y)
        y = self.norm()(y)
        if self.se_ratio > 0:
            y = squeeze_excite(y, self.se_ratio, self.conv)
        if residual.shape != y.shape:
            residual = self.conv(self.filters * 4, (1, 1),
                                 (self.strides, self.strides),
                                 use_bias=False, name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    block_cls: Callable
    num_classes: int
    dtype: jnp.dtype = jnp.bfloat16
    normed_head: bool = False
    se_ratio: float = 0.0
    # Rematerialize each residual block in the backward pass: only block
    # inputs are saved as grad residuals; internals are recomputed during
    # the gradient (byte reduction for the HBM-bound training step — see
    # EfficientNet.remat for the measured rationale).
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = partial(nn.Conv, dtype=self.dtype)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,  # torch momentum 0.1
            epsilon=1e-5,
            dtype=self.dtype,
        )
        x = x.astype(self.dtype)
        x = conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                 use_bias=False, name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        block_cls = (nn.remat(self.block_cls, prevent_cse=False)
                     if self.remat else self.block_cls)
        for i, block_count in enumerate(self.stage_sizes):
            for j in range(block_count):
                strides = 2 if i > 0 and j == 0 else 1
                x = block_cls(
                    filters=64 * 2 ** i,
                    strides=strides,
                    conv=conv,
                    norm=norm,
                    se_ratio=self.se_ratio,
                    name=f"layer{i + 1}_{j}",
                )(x)
        feature = x.mean(axis=(1, 2)).astype(jnp.float32)  # GAP penultimate
        head = (FCNormHead if self.normed_head else LinearHead)(
            self.num_classes, name="head"
        )
        logits = head(feature)
        return feature, logits


def resnet18(num_classes, **kw):
    return ResNet([2, 2, 2, 2], BasicBlock, num_classes, **kw)


def resnet34(num_classes, **kw):
    return ResNet([3, 4, 6, 3], BasicBlock, num_classes, **kw)


def resnet50(num_classes, **kw):
    return ResNet([3, 4, 6, 3], Bottleneck, num_classes, **kw)


def resnet101(num_classes, **kw):
    return ResNet([3, 4, 23, 3], Bottleneck, num_classes, **kw)


def resnet152(num_classes, **kw):
    return ResNet([3, 8, 36, 3], Bottleneck, num_classes, **kw)


# SE variants (reference: model/all_models.py:71-78)
def se_resnet50(num_classes, **kw):
    return ResNet([3, 4, 6, 3], Bottleneck, num_classes, se_ratio=1 / 16, **kw)


def se_resnet101(num_classes, **kw):
    return ResNet([3, 4, 23, 3], Bottleneck, num_classes, se_ratio=1 / 16, **kw)


def se_resnet152(num_classes, **kw):
    return ResNet([3, 8, 36, 3], Bottleneck, num_classes, se_ratio=1 / 16, **kw)


# senet154 lives in models/senet.py — its topology (3-conv stem, grouped
# 3x3 bottlenecks, 2x width, dropout) is not an SE-ResNet variant.
