"""SmallCNN — a compact conv backbone for tests, debugging, and CI.

Not part of the reference zoo; exists because the full backbones are
expensive to compile on CPU test environments. Honors the same
(feature, logits) contract.
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax.numpy as jnp

from fedmlp_tpu.models.heads import FCNormHead, LinearHead

FEATURE_DIM = 128


class SmallCNN(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32
    normed_head: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        x = x.astype(self.dtype)
        for i, ch in enumerate((32, 64, FEATURE_DIM)):
            x = nn.Conv(ch, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype, name=f"conv{i}")(x)
            x = norm(name=f"bn{i}")(x)
            x = nn.relu(x)
        feature = x.mean(axis=(1, 2)).astype(jnp.float32)
        head = (FCNormHead if self.normed_head else LinearHead)(
            self.num_classes, name="head"
        )
        return feature, head(feature)


def smallcnn(num_classes, **kw):
    return SmallCNN(num_classes, **kw)
