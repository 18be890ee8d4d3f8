"""True SENet-154 (Hu et al., 2018), NHWC, bf16-friendly.

The reference pulls ``pretrainedmodels.senet154`` (reference:
model/all_models.py:77-78). That topology differs from the SE-ResNet
family in four ways, all reproduced here:

* stem: three 3x3 convs (64 s2, 64, 128) + BN/ReLU each, then a 3x3/2
  max-pool with ceil_mode=True (emulated with right/bottom padding 1);
* bottleneck: conv1 1x1 widens to ``planes*2`` (2x the SE-ResNet width),
  conv2 is a grouped 3x3 with groups=64 producing ``planes*4``, conv3 is
  a 1x1 at ``planes*4``;
* downsample shortcuts: 1x1 for layer1 (inplanes 128 -> 256), 3x3 pad 1
  stride 2 for layers 2-4 (downsample_kernel_size=3);
* dropout p=0.2 on the pooled feature before the classifier.

Head surgery replaces ``last_linear`` with the task head (reference:
model/all_models.py:131-134), keeping the explicit ``(feature, logits)``
contract: feature is the 2048-wide pooled activation AFTER dropout, which
is what the reference's hooked penultimate output sees in train mode.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from fedmlp_tpu.models.heads import FCNormHead, LinearHead

ModuleDef = Any


class SEModule(nn.Module):
    """Squeeze-excite with biased 1x1 convs (pretrainedmodels.SEModule)."""

    reduction: int
    conv: ModuleDef

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        s = x.mean(axis=(1, 2), keepdims=True)
        s = self.conv(ch // self.reduction, (1, 1), name="fc1")(s)
        s = nn.relu(s)
        s = self.conv(ch, (1, 1), name="fc2")(s)
        return x * nn.sigmoid(s)


class SEBottleneck154(nn.Module):
    """senet154's widened grouped bottleneck (pretrainedmodels.SEBottleneck)."""

    planes: int
    conv: ModuleDef
    norm: ModuleDef
    strides: int = 1
    groups: int = 64
    reduction: int = 16
    downsample_kernel: int = 0  # 0 = identity shortcut

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.planes * 2, (1, 1), use_bias=False, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(self.planes * 4, (3, 3), (self.strides, self.strides),
                      padding=[(1, 1), (1, 1)],
                      feature_group_count=self.groups,
                      use_bias=False, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = self.conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = self.norm(name="bn3")(y)
        y = SEModule(self.reduction, self.conv, name="se_module")(y)
        if self.downsample_kernel:
            k = self.downsample_kernel
            pad = (k - 1) // 2
            residual = self.conv(self.planes * 4, (k, k),
                                 (self.strides, self.strides),
                                 padding=[(pad, pad), (pad, pad)],
                                 use_bias=False, name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class SENet154(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.bfloat16
    normed_head: bool = False
    dropout_p: float = 0.2

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
        # layer0: the input_3x3=True stem
        x = conv(64, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                 use_bias=False, name="stem_conv1")(x)
        x = nn.relu(norm(name="stem_bn1")(x))
        x = conv(64, (3, 3), padding=[(1, 1), (1, 1)],
                 use_bias=False, name="stem_conv2")(x)
        x = nn.relu(norm(name="stem_bn2")(x))
        x = conv(128, (3, 3), padding=[(1, 1), (1, 1)],
                 use_bias=False, name="stem_conv3")(x)
        x = nn.relu(norm(name="stem_bn3")(x))
        # ceil_mode=True 3x3/2 max-pool == right/bottom pad 1 then floor
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(0, 1), (0, 1)])
        for i, (blocks, planes) in enumerate(
                zip((3, 8, 36, 3), (64, 128, 256, 512))):
            for j in range(blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                dk = 0
                if j == 0:
                    dk = 1 if i == 0 else 3  # layer1: 1x1; layers2-4: 3x3
                x = SEBottleneck154(
                    planes=planes, strides=strides, downsample_kernel=dk,
                    conv=conv, norm=norm, name=f"layer{i + 1}_{j}",
                )(x)
        feature = x.mean(axis=(1, 2)).astype(jnp.float32)  # GAP penultimate
        feature = nn.Dropout(self.dropout_p, name="dropout")(
            # active only when the caller threads a 'dropout' rng
            # (algos.base.apply_train does); rng-less train calls stay
            # deterministic rather than erroring
            feature, deterministic=not (train and self.has_rng("dropout"))
        )
        head = (FCNormHead if self.normed_head else LinearHead)(
            self.num_classes, name="head"
        )
        logits = head(feature)
        return feature, logits


def senet154(num_classes, **kw):
    return SENet154(num_classes, **kw)
