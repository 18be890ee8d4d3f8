"""Cross-framework numerical parity against real torch (CPU build in the
image): the reference trains with torch.optim.Adam(weight_decay=5e-4)
(reference: utils/local_training.py:636-637) and BCEWithLogitsLoss /
binary_cross_entropy losses. These tests pin our optax chain and jnp loss
kernels to torch step-for-step / element-for-element."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")

from fedmlp_tpu.ops import losses as L  # noqa: E402
from fedmlp_tpu.parallel.fl_runtime import torch_adam  # noqa: E402


def test_bce_with_logits_matches_torch(rng):
    logits = rng.randn(16, 8).astype(np.float32) * 5
    targets = (rng.rand(16, 8) > 0.6).astype(np.float32)
    pos_w = (rng.rand(8).astype(np.float32) * 9 + 0.5)

    ours = np.asarray(L.bce_with_logits(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(pos_w)))
    ref = torch.nn.BCEWithLogitsLoss(
        reduction="none", pos_weight=torch.from_numpy(pos_w)
    )(torch.from_numpy(logits), torch.from_numpy(targets)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    # no pos_weight path
    ours = np.asarray(L.bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    ref = torch.nn.BCEWithLogitsLoss(reduction="none")(
        torch.from_numpy(logits), torch.from_numpy(targets)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_bce_on_probs_matches_torch_including_log_clamp(rng):
    probs = rng.rand(12, 6).astype(np.float32)
    probs[0, 0] = 0.0   # log(0) -> torch clamps at -100
    probs[1, 1] = 1.0   # log(1-1) -> clamp
    targets = (rng.rand(12, 6) > 0.5).astype(np.float32)
    weight = rng.rand(12, 6).astype(np.float32)

    ours = np.asarray(L.bce_on_probs(
        jnp.asarray(probs), jnp.asarray(targets), jnp.asarray(weight)))
    ref = torch.nn.functional.binary_cross_entropy(
        torch.from_numpy(probs), torch.from_numpy(targets),
        weight=torch.from_numpy(weight), reduction="none").numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_bce_on_probs_grad_matches_torch_at_saturation(rng):
    """Backward parity incl. saturated probabilities. Autodiff through the
    -100 log clamp yields NaN at p ∈ {0,1} (0·∞ chain rule); torch's
    backward is (p-y)/max(p(1-p), 1e-12) — bce_on_probs carries that as a
    custom VJP. Saturation is reachable: sigmoid(x) == 1.0 exactly in f32
    for x ≳ 16.7, which long FedMLP stage-1 local epochs produce."""
    probs = rng.rand(8, 4).astype(np.float32)
    probs[0, 0] = 0.0
    probs[1, 1] = 1.0
    probs[2, 2] = 1.0 - np.float32(1e-7)
    targets = (rng.rand(8, 4) > 0.5).astype(np.float32)
    targets[0, 0] = 1.0  # p=0, y=1: worst case
    targets[1, 1] = 0.0  # p=1, y=0: worst case

    ours = np.asarray(jax.grad(
        lambda p: L.bce_on_probs(p, jnp.asarray(targets)).sum()
    )(jnp.asarray(probs)))
    tp = torch.from_numpy(probs).requires_grad_(True)
    torch.nn.functional.binary_cross_entropy(
        tp, torch.from_numpy(targets), reduction="sum").backward()
    ref = tp.grad.numpy()
    assert np.all(np.isfinite(ours))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)

    # composed with sigmoid: the saturated-logit gradient must be exactly 0
    logits = jnp.asarray([[25.0, -120.0, 2.0]], jnp.float32)
    y = jnp.asarray([[0.0, 1.0, 1.0]], jnp.float32)
    g = np.asarray(jax.grad(
        lambda x: L.bce_on_probs(jax.nn.sigmoid(x), y).sum())(logits))
    assert np.all(np.isfinite(g))
    assert g[0, 0] == 0.0 and g[0, 1] == 0.0 and g[0, 2] != 0.0


@pytest.mark.parametrize("weight_decay", [0.0, 5e-4])
def test_torch_adam_matches_torch_step_for_step(rng, weight_decay):
    """torch Adam folds L2 into the gradient BEFORE the moment updates
    (decoupled-AdamW would differ) — 10 identical steps must agree."""
    lr = 3e-4
    shapes = [(7, 5), (5,), (3, 3, 2, 4)]
    params_np = [rng.randn(*s).astype(np.float32) for s in shapes]
    grads_np = [
        [rng.randn(*s).astype(np.float32) for s in shapes] for _ in range(10)
    ]

    tp = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in params_np]
    topt = torch.optim.Adam(tp, lr=lr, betas=(0.9, 0.999), eps=1e-8,
                            weight_decay=weight_decay)
    for g in grads_np:
        topt.zero_grad()
        for p, gi in zip(tp, g):
            p.grad = torch.from_numpy(gi.copy())
        topt.step()

    jp = [jnp.asarray(p) for p in params_np]
    tx = torch_adam(lr, weight_decay)
    state = tx.init(jp)

    @jax.jit
    def step(params, state, grads):
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    for g in grads_np:
        jp, state = step(jp, state, [jnp.asarray(gi) for gi in g])

    for ours, ref in zip(jp, tp):
        np.testing.assert_allclose(
            np.asarray(ours), ref.detach().numpy(), rtol=2e-5, atol=2e-7)
