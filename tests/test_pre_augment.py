"""Out-of-program view computation (fl_runtime.pre_augment_views): the
crash-dodge fallback for the weak+strong at-scale TPU-worker fault
(BENCH_NOTES "Round-5: fixmatch rung"). Contracts:

* chunk-invariant BITWISE (the per-image key tables are exactly the
  backends' unchunked internal derivation);
* a mapped-engine round fed the pre-augmented dict matches the same
  round with ``hoist_augment=1`` (same fold_in(key, 0x9A) stream —
  fl_runtime make_local_round): per-round client losses bitwise, params
  to f32 roundoff (separate jit programs fuse the augment math in a
  different context than the in-round hoist — observed 1 ulp);
* forcing ``pre_augment`` on a non-mapped engine is a typed config error.
"""

import jax
import numpy as np
import pytest

import fedmlp_tpu.ops.augment as A
import fedmlp_tpu.parallel.fl_runtime as rt
from fedmlp_tpu.config import Config, DataConfig
from fedmlp_tpu.data.datasets import make_synthetic_dataset
from fedmlp_tpu.train import Trainer

pytestmark = pytest.mark.smoke

MEAN = (0.49, 0.50, 0.51)
STD = (0.22, 0.23, 0.24)


def _imgs(S=2, K=3, B=4, hw=16, seed=0):
    rng = np.random.RandomState(seed)
    return jax.numpy.asarray(
        rng.randint(0, 256, (S, K, B, hw, hw, 3), dtype=np.uint8))


def test_chunk_invariance_and_unchunked_equality():
    imgs = _imgs()
    key = jax.random.PRNGKey(7)
    kw = dict(view_mode="weak_strong", augment_backend="gather",
              mean=MEAN, std=STD)
    n = int(np.prod(imgs.shape[:3]))
    full = rt.pre_augment_views(imgs, key, chunk=n, **kw)
    small = rt.pre_augment_views(imgs, key, chunk=5, **kw)  # pads 24 -> 25
    for name in ("x1", "x2"):
        assert np.array_equal(np.asarray(full[name]),
                              np.asarray(small[name])), name

    # the full-chunk call must match the backends' own internal derivation
    # (what the in-round hoist produces): weak(k1) / strong(k2) from
    # fold_in(key, 0x9A) — ops/augment.py:347-380. The eager reference runs
    # op-by-op while the chunk programs are jit-fused, so this comparison
    # is to f32 roundoff; the BITWISE contract vs the jitted hoist path is
    # test_round_bitwise_equals_hoist below.
    flat = np.asarray(imgs).reshape((n,) + imgs.shape[3:])
    k1, k2 = jax.random.split(jax.random.fold_in(key, 0x9A))
    exp1 = A.weak_augment_batch(flat, k1, MEAN, STD)
    exp2 = A.strong_augment_batch(flat, k2, MEAN, STD)
    np.testing.assert_allclose(
        np.asarray(full["x1"]).reshape(exp1.shape), np.asarray(exp1),
        atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(full["x2"]).reshape(exp2.shape), np.asarray(exp2),
        atol=1e-4, rtol=1e-4)


def _cfg(**kw):
    return Config(
        algorithm="fixmatch", model="smallcnn", batch_size=8, base_lr=1e-3,
        n_clients=4, local_ep=1, rounds_warmup=2, eval_every=100, seed=5,
        p_pos=0.5,
        data=DataConfig(name="synthetic", n_classes=4, image_size=32,
                        augment_backend="gather"),
        compute_dtype="float32", output_dir="", **kw,
    )


def _leaves(state):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(state["vars"])]


def test_round_bitwise_equals_hoist():
    ds = make_synthetic_dataset(128, 4, 32, seed=3)
    test = make_synthetic_dataset(16, 4, 32, seed=4)
    t_hoist = Trainer(_cfg(hoist_augment=1, pre_augment=0),
                      train_ds=ds, test_ds=test)
    t_pre = Trainer(_cfg(pre_augment=48),  # S*K*B=128 -> pads 128 -> 144
                    train_ds=ds, test_ds=test)
    assert t_pre._pre_augment_chunk == 48
    for r in range(2):
        rec_h = t_hoist.run_round(r)
        rec_p = t_pre.run_round(r)
        assert np.array_equal(np.asarray(rec_h.client_losses),
                              np.asarray(rec_p.client_losses))
    # separate jit programs may fuse the augment math differently than the
    # in-round hoist, so params agree to f32 roundoff (observed: 1 ulp),
    # while the per-round client losses above matched bitwise
    for a, b in zip(_leaves({"vars": t_hoist.global_vars}),
                    _leaves({"vars": t_pre.global_vars})):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_pre_augment_rejects_non_mapped_engine():
    import dataclasses

    ds = make_synthetic_dataset(64, 4, 32, seed=3)
    test = make_synthetic_dataset(16, 4, 32, seed=4)
    cfg = dataclasses.replace(_cfg(pre_augment=32), algorithm="fedmlp",
                              batched_global="on", p_pos=0.0)
    with pytest.raises(ValueError, match="mapped engine"):
        Trainer(cfg, train_ds=ds, test_ds=test)
