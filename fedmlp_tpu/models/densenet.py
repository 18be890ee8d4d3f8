"""DenseNet 121/161/169/201 (torchvision topology,
reference: model/all_models.py:63-70). Forward returns (feature, logits);
feature = GAP of the final dense-block output (1024 for 121, 2208 for 161,
1664 for 169, 1920 for 201)."""

from __future__ import annotations

from functools import partial
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from fedmlp_tpu.models.heads import FCNormHead, LinearHead

_CFGS = {
    "densenet121": (32, (6, 12, 24, 16), 64),
    "densenet169": (32, (6, 12, 32, 32), 64),
    "densenet201": (32, (6, 12, 48, 32), 64),
    "densenet161": (48, (6, 12, 36, 24), 96),
}


class DenseLayer(nn.Module):
    growth: int
    norm: partial
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = self.norm(name="bn1")(x)
        h = nn.relu(h)
        h = nn.Conv(4 * self.growth, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
        h = self.norm(name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.growth, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        return jnp.concatenate([x, h], axis=-1)


class DenseNet(nn.Module):
    growth: int
    block_config: Sequence[int]
    stem: int
    num_classes: int
    dtype: jnp.dtype = jnp.bfloat16
    normed_head: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        x = x.astype(self.dtype)
        x = nn.Conv(self.stem, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        ch = self.stem
        for bi, n_layers in enumerate(self.block_config):
            for li in range(n_layers):
                x = DenseLayer(self.growth, norm, self.dtype,
                               name=f"block{bi}_layer{li}")(x)
                ch += self.growth
            if bi != len(self.block_config) - 1:
                x = norm(name=f"trans{bi}_bn")(x)
                x = nn.relu(x)
                ch = ch // 2
                x = nn.Conv(ch, (1, 1), use_bias=False, dtype=self.dtype,
                            name=f"trans{bi}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = norm(name="final_bn")(x)
        x = nn.relu(x)
        feature = x.mean(axis=(1, 2)).astype(jnp.float32)
        head = (FCNormHead if self.normed_head else LinearHead)(
            self.num_classes, name="head"
        )
        return feature, head(feature)


def _make(name):
    def ctor(num_classes, **kw):
        g, cfg, stem = _CFGS[name]
        return DenseNet(g, cfg, stem, num_classes, **kw)

    ctor.__name__ = name
    return ctor


densenet121 = _make("densenet121")
densenet161 = _make("densenet161")
densenet169 = _make("densenet169")
densenet201 = _make("densenet201")
