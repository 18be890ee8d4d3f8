"""VGG 11/13/16/19 (torchvision topology, reference: model/all_models.py:45-52).

Penultimate feature = the 4096-d activation before the final classifier
layer (reference head surgery replaces classifier[6],
model/all_models.py:109-112); forward returns (feature, logits).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from fedmlp_tpu.models.heads import FCNormHead, LinearHead

_CFGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
              512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


class VGG(nn.Module):
    cfg: Sequence
    num_classes: int
    dtype: jnp.dtype = jnp.bfloat16
    normed_head: bool = False
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        ci = 0
        for v in self.cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name=f"conv{ci}")(x)
                x = nn.relu(x)
                ci += 1
        # torchvision adaptive-avg-pools to 7x7 before the classifier
        if x.shape[1] != 7:
            x = jnp.mean(
                x.reshape(x.shape[0], 7, x.shape[1] // 7, 7, x.shape[2] // 7, -1),
                axis=(2, 4),
            ) if x.shape[1] % 7 == 0 else nn.avg_pool(
                x, (max(1, x.shape[1] // 7),) * 2, (max(1, x.shape[1] // 7),) * 2
            )
        x = x.reshape(x.shape[0], -1)
        # dropout active in train when the engine threads a 'dropout' rng
        # (torchvision classifier = Linear/ReLU/Dropout ×2 then the head)
        det = not (train and self.has_rng("dropout"))
        x = nn.Dense(4096, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=det)(x)
        x = nn.Dense(4096, dtype=self.dtype, name="fc2")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=det)(x)
        feature = x.astype(jnp.float32)
        head = (FCNormHead if self.normed_head else LinearHead)(
            self.num_classes, name="head"
        )
        return feature, head(feature)


def vgg11(num_classes, **kw):
    return VGG(_CFGS["vgg11"], num_classes, **kw)


def vgg13(num_classes, **kw):
    return VGG(_CFGS["vgg13"], num_classes, **kw)


def vgg16(num_classes, **kw):
    return VGG(_CFGS["vgg16"], num_classes, **kw)


def vgg19(num_classes, **kw):
    return VGG(_CFGS["vgg19"], num_classes, **kw)
