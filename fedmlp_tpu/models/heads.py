"""Classification heads.

Every backbone forward returns ``(feature, logits)`` — the implicit contract
all reference call sites rely on (e.g. utils/local_training.py:657,937;
utils/evaluations.py:25) but which the reference's stock torchvision models
never actually satisfied (SURVEY.md §0 quirk). Here it is the explicit API.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class LinearHead(nn.Module):
    """Plain linear classifier (reference: model/all_models.py:137)."""

    num_classes: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.num_classes, use_bias=self.use_bias,
                        dtype=self.dtype, name="fc")(x)


class FCNormHead(nn.Module):
    """Cosine-normalized classifier, scale s=30
    (reference: model/all_models.py:17-26)."""

    num_classes: int
    s: float = 30.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            nn.initializers.uniform(scale=2.0),  # ~U(-1,1) after shift below
            (x.shape[-1], self.num_classes),
            jnp.float32,
        )
        w = w - 1.0  # uniform(scale=2) is U(0,2); shift → U(-1,1)
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        wn = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)
        return self.s * jnp.dot(xn, wn.astype(x.dtype))
