#!/usr/bin/env python
"""Dump the optimized HLO (with buffer layouts) of a single-client FedMLP
stage-1 grad step — the body the flagship's lax.map runs per client — to
inspect XLA:TPU layout assignment on EfficientNet-B0's small-channel
activations (the round-4 byte-inflation hypothesis: C in {16,24,32,96,144}
padded toward the 128-lane tile ⇒ 1.3-8x HBM traffic on early blocks).

Usage: python tools/dump_hlo.py [out.txt] [--model efficient_b0] [--batch 32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="/tmp/step_hlo.txt")
    ap.add_argument("--model", default="efficient_b0")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--classes", type=int, default=8)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))

    from fedmlp_tpu.models import build_model
    from fedmlp_tpu.models.factory import init_model
    from fedmlp_tpu.ops import losses as L

    model = build_model(a.model, a.classes, compute_dtype=jnp.bfloat16)
    variables = init_model(model, jax.random.PRNGKey(0), a.size, batch=2)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p, x1, x2, g1, g2, labels, active):
        _, logits1, _ = _apply(p, x1)
        _, logits2, _ = _apply(p, x2)
        p1 = jax.nn.sigmoid(logits1)
        p2 = jax.nn.sigmoid(logits2)
        sup = (L.bce_on_probs(p1, labels) + L.bce_on_probs(p2, labels)) / 2.0
        dis = ((p1 - jax.nn.sigmoid(g1)) ** 2
               + (p2 - jax.nn.sigmoid(g2)) ** 2) / 2.0
        B = logits1.shape[0]
        loss = (sup * active).sum() / B + (dis * (1 - active)).sum() / B
        return loss

    def _apply(p, x):
        out, new_rest = model.apply(
            {"params": p, **rest}, x, train=True,
            mutable=["batch_stats"] if "batch_stats" in rest else [],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        feature, logits = out
        return feature, logits, new_rest

    B, S, C = a.batch, a.size, a.classes
    x = jnp.zeros((B, S, S, 3), jnp.float32)
    g = jnp.zeros((B, C), jnp.float32)
    lab = jnp.zeros((B, C), jnp.float32)
    act = jnp.zeros((C,), jnp.float32)

    lowered = jax.jit(jax.grad(loss_fn)).lower(params, x, x, g, g, lab, act)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(a.out, "w") as f:
        f.write(txt)
    print(f"wrote {a.out} ({len(txt) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
