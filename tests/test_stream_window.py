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


def _cfg(window, *, local_ep=1, rounds_stage1=10, seed=31):
    return Config(
        algorithm="fedmlp", model="smallcnn", batch_size=8, base_lr=1e-3,
        n_clients=4, local_ep=local_ep, rounds_warmup=4, eval_every=100,
        seed=seed, p_pos=0.0,
        fedmlp=FedMLPConfig(rounds_stage1=rounds_stage1, clean_threshold=0.2,
                            noise_threshold=0.2),
        data=DataConfig(name="synthetic", n_classes=4, image_size=32,
                        host_stream=True, stream_window=window),
        compute_dtype="float32",
        batched_global="on",  # lockstep engine (the carry-capable one)
        output_dir="",
    )


def _make(tmp_path, window, **kw):
    ds = make_synthetic_dataset(128, 4, 32, seed=11)
    test = make_synthetic_dataset(16, 4, 32, seed=12)
    npy = str(tmp_path / f"im{window}.npy")
    np.save(npy, ds.images)
    t = Trainer(_cfg(window, **kw), train_ds=ds, test_ds=test, images_npy=npy)
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
