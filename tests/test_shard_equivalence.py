"""The shard_map'd round must produce the same result as the single-shard
lax.map round — sharding is an execution detail, not semantics."""

import numpy as np
import pytest

import jax

from fedmlp_tpu.config import Config, DataConfig
from fedmlp_tpu.train import Trainer


def make_trainer(use_mesh):
    cfg = Config(
        algorithm="fedavg", model="smallcnn", batch_size=8, base_lr=1e-3,
        n_clients=8, local_ep=1, rounds_warmup=2, eval_every=100, seed=17,
        data=DataConfig(name="synthetic", n_classes=4, image_size=32,
                        synthetic_train_size=128, synthetic_test_size=16),
        compute_dtype="float32",
    )
    return Trainer(cfg, use_mesh=use_mesh)


def test_sharded_round_matches_unsharded():
    t_sharded = make_trainer(True)
    t_plain = make_trainer(False)
    assert t_sharded.round_mesh is not None, "mesh path must be active"
    assert t_plain.round_mesh is None

    rec_s = t_sharded.run_round(0)
    rec_p = t_plain.run_round(0)
    np.testing.assert_allclose(
        rec_s.client_losses, rec_p.client_losses, rtol=1e-4, atol=1e-5
    )
    leaf_s = np.asarray(
        jax.tree_util.tree_leaves(t_sharded.global_vars["params"])[0]
    )
    leaf_p = np.asarray(
        jax.tree_util.tree_leaves(t_plain.global_vars["params"])[0]
    )
    np.testing.assert_allclose(leaf_s, leaf_p, rtol=1e-4, atol=1e-5)


def test_data_axis_round_runs():
    """4 clients × 2-way per-client data parallelism on the 8-device mesh:
    grads pmean over the 'data' axis, BN stats synced."""
    from fedmlp_tpu.config import MeshConfig

    cfg = Config(
        algorithm="fedavg", model="smallcnn", batch_size=8, base_lr=1e-3,
        n_clients=4, local_ep=1, rounds_warmup=2, eval_every=100, seed=19,
        mesh=MeshConfig(data_axis=2),
        data=DataConfig(name="synthetic", n_classes=4, image_size=32,
                        synthetic_train_size=64, synthetic_test_size=16),
        compute_dtype="float32",
    )
    t = Trainer(cfg)
    assert t.mesh.shape == {"client": 4, "data": 2}
    assert t.round_mesh is not None
    rec = t.run_round(0)
    assert np.isfinite(rec.client_losses).all()
    rec = t.run_round(1)
    assert np.isfinite(rec.client_losses).all()
