"""Client-sharded FedMLP == unsharded FedMLP, across the stage boundary.

Round 2's gap (VERDICT): only the fedavg engine path was shard-tested; the
flagship's custom_round (stage-1 extraction harvest, stage-2 tagging +
harvest + pseudo-label training, reference utils/local_training.py:
971-1002/1023-1250) had never executed with clients actually sharded.
These tests run 2 rounds spanning stage 1 → stage 2 on the 8-device CPU
mesh and assert the sharded run matches the single-shard run: losses,
accumulated tags, τ/prototypes, and the aggregated global model.
"""

import jax
import numpy as np

from fedmlp_tpu.config import Config, DataConfig, FedMLPConfig
from fedmlp_tpu.train import Trainer


def _cfg(batched_global: str = "off") -> Config:
    return Config(
        algorithm="fedmlp",
        model="smallcnn",
        batch_size=8,
        base_lr=1e-3,
        n_clients=8,
        local_ep=1,
        rounds_warmup=3,
        eval_every=10_000,
        seed=23,
        p_pos=0.0,
        fedmlp=FedMLPConfig(rounds_stage1=1, clean_threshold=0.2,
                            noise_threshold=0.2),
        data=DataConfig(name="synthetic", n_classes=4, image_size=32,
                        synthetic_train_size=128, synthetic_test_size=16,
                        augment_backend="normonly"),
        compute_dtype="float32",
        client_stacking="off",
        batched_global=batched_global,
        output_dir="",
    )


def _run(cfg, use_mesh):
    t = Trainer(cfg, use_mesh=use_mesh)
    losses = [t.run_round(rnd).client_losses for rnd in range(2)]
    return t, losses


def _assert_equivalent(t_s, l_s, t_p, l_p):
    np.testing.assert_allclose(l_s, l_p, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        t_s.server_state["tags"], t_p.server_state["tags"]
    )
    np.testing.assert_allclose(
        t_s.server_state["tao"], t_p.server_state["tao"], rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        t_s.server_state["proto"], t_p.server_state["proto"], rtol=1e-4,
        atol=1e-5,
    )
    for a, b in zip(jax.tree_util.tree_leaves(t_s.global_vars["params"]),
                    jax.tree_util.tree_leaves(t_p.global_vars["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fedmlp_sharded_matches_unsharded_mapped():
    t_s, l_s = _run(_cfg("off"), use_mesh=True)
    assert t_s.round_mesh is not None, "mesh path must be active"
    t_p, l_p = _run(_cfg("off"), use_mesh=False)
    _assert_equivalent(t_s, l_s, t_p, l_p)


def test_fedmlp_sharded_matches_unsharded_lockstep():
    """The lockstep engine's shard_map path (frozen-global forwards batched
    at K_local·B per device) must also be an execution detail."""
    t_s, l_s = _run(_cfg("on"), use_mesh=True)
    assert t_s.round_mesh is not None and t_s._use_lockstep()
    t_p, l_p = _run(_cfg("on"), use_mesh=False)
    _assert_equivalent(t_s, l_s, t_p, l_p)
