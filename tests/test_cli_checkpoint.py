"""CLI config mapping + checkpoint/resume round-trip."""

import numpy as np
import pytest

from fedmlp_tpu.cli import args_parser, config_from_args
from fedmlp_tpu.config import Config, DataConfig
from fedmlp_tpu.train import Trainer
from fedmlp_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_cli_reference_spellings():
    a = args_parser(
        ["--exp", "FeMLP", "--dataset", "ICH", "--rounds_FedMLP_stage1", "7"]
    )
    cfg = config_from_args(a)
    assert cfg.algorithm == "fedmlp"  # FeMLP skew normalized
    assert cfg.n_clients == 5 and cfg.data.n_classes == 5
    assert cfg.base_lr == pytest.approx(3e-5)  # ICH preset
    assert cfg.fedmlp.rounds_stage1 == 7


def test_cli_chestxray_preset():
    a = args_parser(["--exp", "FedAVG", "--dataset", "ChestXray14"])
    cfg = config_from_args(a)
    assert cfg.n_clients == 8 and cfg.data.n_classes == 8
    assert cfg.base_lr == pytest.approx(3e-6)


def test_cli_fixmatch_alias():
    a = args_parser(["--exp", "FedAVG+FixMatch", "--dataset", "synthetic"])
    cfg = config_from_args(a)
    assert cfg.algorithm == "fixmatch"


def test_cli_stream_window_mapping(tmp_path):
    a = args_parser(
        ["--exp", "FedAVG", "--dataset", "ICH", "--data_root", str(tmp_path),
         "--host_stream", "1", "--stream_window", "4"]
    )
    cfg = config_from_args(a)
    assert cfg.data.host_stream and cfg.data.stream_window == 4
    # stream_window without host_stream is a config error
    a = args_parser(
        ["--exp", "FedAVG", "--dataset", "ICH", "--data_root", str(tmp_path),
         "--stream_window", "4"]
    )
    with pytest.raises(SystemExit):
        config_from_args(a)


def _small_trainer(seed=5):
    cfg = Config(
        algorithm="fedavg", model="smallcnn", batch_size=16, base_lr=1e-3,
        n_clients=4, local_ep=1, rounds_warmup=4, eval_every=100, seed=seed,
        data=DataConfig(name="synthetic", n_classes=4, image_size=32,
                        synthetic_train_size=128, synthetic_test_size=32),
        compute_dtype="float32",
    )
    return Trainer(cfg)


def test_fedmlp_resume_preserves_stage2_state(tmp_path):
    """Resume mid-stage-2 must restore tags/tau/prototypes — the true-resume
    gap of the reference (SURVEY.md §5: stage-2 traindata_idx not saved)."""
    from fedmlp_tpu.config import FedMLPConfig

    def mk():
        cfg = Config(
            algorithm="fedmlp", model="smallcnn", batch_size=16,
            base_lr=1e-3, n_clients=4, local_ep=1, rounds_warmup=4,
            eval_every=100, seed=9,
            fedmlp=FedMLPConfig(rounds_stage1=2, clean_threshold=0.1,
                                noise_threshold=0.1),
            data=DataConfig(name="synthetic", n_classes=4, image_size=32,
                            synthetic_train_size=128, synthetic_test_size=32),
            compute_dtype="float32",
        )
        return Trainer(cfg)

    t1 = mk()
    for r in range(3):  # into stage 2 (tags exist)
        t1.run_round(r)
    assert (t1.server_state["tags"] > 0).any()
    f = save_checkpoint(str(tmp_path), t1, 2)
    t1.run_round(3)
    ref_tags = t1.server_state["tags"].copy()

    t2 = mk()
    nxt = load_checkpoint(f, t2)
    assert nxt == 3
    t2.run_round(3)
    np.testing.assert_array_equal(t2.server_state["tags"], ref_tags)


def _algo_trainer(algorithm):
    from fedmlp_tpu.config import CBAFedConfig, FedIRMConfig, RoFLConfig

    cfg = Config(
        algorithm=algorithm, model="smallcnn", batch_size=16, base_lr=1e-3,
        n_clients=4, local_ep=1, rounds_warmup=4, eval_every=100, seed=11,
        data=DataConfig(name="synthetic", n_classes=4, image_size=32,
                        synthetic_train_size=128, synthetic_test_size=32),
        compute_dtype="float32",
        # push each algorithm into its stateful phase by round 2
        rofl=RoFLConfig(T_pl=1),
        cbafed=CBAFedConfig(rounds_warmup=2),
        fedirm=FedIRMConfig(rounds_sup=1),
    )
    return Trainer(cfg)


@pytest.mark.parametrize("algorithm,probe", [
    ("rofl", lambda t: t.server_state["pseudo"]),        # pseudo table + f_G
    ("cbafed", lambda t: t.server_state["tao"]),         # τ + residual mix
    ("rscfed", lambda t: None),                          # persistent teacher
    ("fedirm", lambda t: t.server_state["relation"]),    # relation + teacher
])
def test_stateful_algorithms_resume_bitwise(tmp_path, algorithm, probe):
    """Every algorithm with persistent state (server_state or registered
    trainer attributes via get_persistent/set_persistent) must continue
    bitwise after resume."""
    import jax

    t1 = _algo_trainer(algorithm)
    t1.run_round(0)
    t1.run_round(1)
    f = save_checkpoint(str(tmp_path), t1, 1)
    t1.run_round(2)
    ref_leaf = np.asarray(jax.tree_util.tree_leaves(t1.global_vars["params"])[0])
    ref_probe = None if probe(t1) is None else np.asarray(probe(t1)).copy()
    ref_losses = t1.history[-1].client_losses

    t2 = _algo_trainer(algorithm)
    nxt = load_checkpoint(f, t2)
    assert nxt == 2
    t2.run_round(2)
    leaf = np.asarray(jax.tree_util.tree_leaves(t2.global_vars["params"])[0])
    np.testing.assert_allclose(leaf, ref_leaf, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        t2.history[-1].client_losses, ref_losses, rtol=1e-5, atol=1e-6)
    if ref_probe is not None:
        np.testing.assert_allclose(np.asarray(probe(t2)), ref_probe,
                                   rtol=1e-6, atol=1e-7)


def test_checkpoint_resume_bitwise(tmp_path):
    import jax

    t1 = _small_trainer()
    t1.run_round(0)
    t1.run_round(1)
    f = save_checkpoint(str(tmp_path), t1, 1)
    # continue original
    t1.run_round(2)
    ref_leaf = np.asarray(jax.tree_util.tree_leaves(t1.global_vars["params"])[0])

    # fresh trainer, resume, rerun round 2
    t2 = _small_trainer()
    nxt = load_checkpoint(f, t2)
    assert nxt == 2
    t2.run_round(2)
    leaf = np.asarray(jax.tree_util.tree_leaves(t2.global_vars["params"])[0])
    np.testing.assert_allclose(leaf, ref_leaf, rtol=1e-6, atol=1e-7)
