"""Scaled configs: 8 clients sharded over the 8-device CPU mesh, uneven
client sizes (ragged batch masking), non-IID partitions, 20-client config
(BASELINE configs[4])."""

import numpy as np
import pytest

from fedmlp_tpu.config import Config, DataConfig, FedMLPConfig
from fedmlp_tpu.data.datasets import make_synthetic_dataset
from fedmlp_tpu.train import Trainer


def cfg_for(n_clients, n=256, algo="fedavg", **kw):
    base = dict(
        algorithm=algo,
        model="smallcnn",
        batch_size=8,
        base_lr=1e-3,
        n_clients=n_clients,
        local_ep=1,
        rounds_warmup=2,
        eval_every=100,
        seed=21,
        data=DataConfig(
            name="synthetic", n_classes=4, image_size=32,
            synthetic_train_size=n, synthetic_test_size=32,
        ),
        compute_dtype="float32",
    )
    base.update(kw)
    return Config(**base)


def test_8_clients_sharded_over_8_devices():
    import jax

    assert jax.device_count() == 8
    t = Trainer(cfg_for(8))
    assert t.mesh.shape["client"] == 8
    rec = t.run_round(0)
    assert np.isfinite(rec.client_losses).all()


def test_uneven_client_sizes_ragged_masking():
    cfg = cfg_for(4, n=200)
    ds = make_synthetic_dataset(200, 4, 32, seed=3)
    # deliberately uneven: 100 / 50 / 30 / 20
    dict_users = {
        0: list(range(0, 100)),
        1: list(range(100, 150)),
        2: list(range(150, 180)),
        3: list(range(180, 200)),
    }
    test = make_synthetic_dataset(32, 4, 32, seed=4)
    t = Trainer(cfg, train_ds=ds, test_ds=test, dict_users=dict_users)
    assert t.fd.max_local == 100
    np.testing.assert_array_equal(np.asarray(t.fd.n_local), [100, 50, 30, 20])
    rec = t.run_round(0)
    assert np.isfinite(rec.client_losses).all()
    # every client actually trained (loss > 0)
    assert (np.asarray(rec.client_losses) > 0).all()


def test_non_iid_partition_end_to_end():
    t = Trainer(cfg_for(4, iid=0, alpha_dirichlet=0.5))
    sizes = np.asarray(t.fd.n_local)
    assert sizes.sum() == 256
    rec = t.run_round(0)
    assert np.isfinite(rec.client_losses).all()


def test_10_clients_sharded_over_8_devices_padded():
    """Non-divisible client counts shard via no-op dummy-client padding
    (fl_runtime._pad_clients_tree): padded-sharded == unsharded."""
    import jax

    assert jax.device_count() == 8
    t_pad = Trainer(cfg_for(10, n=320))
    assert t_pad.round_mesh is not None, "padded shard path must be active"
    assert t_pad.mesh.shape["client"] == 8
    t_plain = Trainer(cfg_for(10, n=320), use_mesh=False)
    rec_s = t_pad.run_round(0)
    rec_p = t_plain.run_round(0)
    np.testing.assert_allclose(
        rec_s.client_losses, rec_p.client_losses, rtol=1e-4, atol=1e-5)
    import jax as _jax
    for a, b in zip(_jax.tree_util.tree_leaves(t_pad.global_vars["params"]),
                    _jax.tree_util.tree_leaves(t_plain.global_vars["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_20_client_fedmlp_scaled():
    # BASELINE configs[4]: 20 heterogeneous clients on the 8-device mesh —
    # shards as 24 padded clients (3 per device) since round 5
    cfg = cfg_for(
        20, n=400, algo="fedmlp",
        fedmlp=FedMLPConfig(rounds_stage1=1, clean_threshold=0.2,
                            noise_threshold=0.2),
    )
    t = Trainer(cfg)
    rec0 = t.run_round(0)  # stage-1 final round: extraction
    assert t.server_state["proto"].shape == (8, 128)
    rec1 = t.run_round(1)  # stage-2 tagging round
    assert np.isfinite(rec1.client_losses).all()
    assert (t.server_state["tags"] > 0).sum() > 0
