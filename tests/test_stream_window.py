"""Windowed host-stream rounds: W-step windows must compose to exactly the
unwindowed round (Adam moments, RNG stream and loss means all thread through
the lockstep engine's carry — parallel/fl_runtime.py round_entry.init_carry,
train.py::Trainer._windowed_pass).

This is the larger-than-HBM execution mode: an ICH-scale round is ~27 GB of
uint8 images (reference preprocess/ICH_process.py:45-46), which cannot be
gathered to the device up front; windows bound residency at W·K·B images.
"""

import jax
import numpy as np
import pytest

from fedmlp_tpu.config import Config, DataConfig, FedMLPConfig
from fedmlp_tpu.data.datasets import make_synthetic_dataset
from fedmlp_tpu.train import Trainer

pytestmark = pytest.mark.smoke


def _cfg(window, *, local_ep=1, rounds_stage1=10, seed=31, n_clients=4,
         algorithm="fedmlp", batched_global="on"):
    return Config(
        algorithm=algorithm, model="smallcnn", batch_size=8, base_lr=1e-3,
        n_clients=n_clients, local_ep=local_ep, rounds_warmup=4,
        eval_every=100, seed=seed, p_pos=0.0,
        fedmlp=FedMLPConfig(rounds_stage1=rounds_stage1, clean_threshold=0.2,
                            noise_threshold=0.2),
        data=DataConfig(name="synthetic", n_classes=4, image_size=32,
                        host_stream=True, stream_window=window),
        compute_dtype="float32",
        batched_global=batched_global,
        output_dir="",
    )


def _make(tmp_path, window, use_mesh=False, expect_lockstep=True, **kw):
    ds = make_synthetic_dataset(128, 4, 32, seed=11)
    test = make_synthetic_dataset(16, 4, 32, seed=12)
    npy = str(tmp_path / f"im{window}.npy")
    np.save(npy, ds.images)
    t = Trainer(_cfg(window, **kw), train_ds=ds, test_ds=test,
                images_npy=npy, use_mesh=use_mesh)
    if expect_lockstep:
        assert t._use_lockstep()
    assert t.fd.images is None
    return t


def _params0(t):
    return np.asarray(jax.tree_util.tree_leaves(t.global_vars["params"])[0])


def test_windowed_equals_unwindowed(tmp_path):
    # 128 samples / 4 clients / batch 8 → S=4 steps; W=2 → two windows
    t_full = _make(tmp_path, 0)
    t_win = _make(tmp_path, 2)
    for r in range(2):
        rec_f = t_full.run_round(r)
        rec_w = t_win.run_round(r)
        np.testing.assert_allclose(
            rec_w.client_losses, rec_f.client_losses, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        _params0(t_win), _params0(t_full), rtol=1e-6, atol=1e-7)


def test_windowed_ragged_tail(tmp_path):
    # W=3 with S=4 → a full window plus a 1-step tail program
    t_full = _make(tmp_path, 0)
    t_win = _make(tmp_path, 3)
    rec_f = t_full.run_round(0)
    rec_w = t_win.run_round(0)
    np.testing.assert_allclose(
        rec_w.client_losses, rec_f.client_losses, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        _params0(t_win), _params0(t_full), rtol=1e-6, atol=1e-7)


def test_windowed_two_stage_transition(tmp_path):
    # stage-1 → harvest/tagging → stage-2 rounds, all windowed + streamed
    t = _make(tmp_path, 2, local_ep=2, rounds_stage1=2)
    for r in range(4):
        rec = t.run_round(r)
        assert np.isfinite(rec.client_losses).all()
    assert (t.server_state["tags"] > 0).sum() > 0


def test_windowed_sharded_matches_unwindowed_unsharded(tmp_path):
    """Larger-than-HBM streaming composes with client-axis sharding: the
    lockstep engine's per-client RNG streams (fold_in by GLOBAL client id,
    no axis_index) make windowed+shard_map == unwindowed+single-shard
    exactly. 8 clients over the 8-device CPU mesh, two rounds spanning
    the stage-1 → stage-2 boundary."""
    kw = dict(n_clients=8, local_ep=2, rounds_stage1=1)
    t_plain = _make(tmp_path, 0, use_mesh=False, **kw)
    t_ws = _make(tmp_path, 2, use_mesh=True, **kw)
    assert t_ws.round_mesh is not None, "mesh path must be active"
    for r in range(2):
        rec_p = t_plain.run_round(r)
        rec_w = t_ws.run_round(r)
        np.testing.assert_allclose(
            rec_w.client_losses, rec_p.client_losses, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        t_ws.server_state["tags"], t_plain.server_state["tags"])
    np.testing.assert_allclose(
        _params0(t_ws), _params0(t_plain), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("algorithm", ["rscfed", "rofl"])
def test_windowed_stateful_matches_unwindowed(tmp_path, algorithm):
    """Carry-stateful algorithms stream too: the mapped engine's windowed
    carry threads Adam/RNG/loss accumulators while the persistent teacher
    (RSCFed) / pseudo-label cstate (RoFL) ride their regular state entries
    across windows."""
    kw = dict(algorithm=algorithm, batched_global="off",
              expect_lockstep=False)
    t_full = _make(tmp_path, 0, **kw)
    t_win = _make(tmp_path, 2, **kw)
    assert not t_full._use_lockstep()
    for r in range(2):
        rec_f = t_full.run_round(r)
        rec_w = t_win.run_round(r)
        np.testing.assert_allclose(
            rec_w.client_losses, rec_f.client_losses, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        _params0(t_win), _params0(t_full), rtol=1e-6, atol=1e-7)
