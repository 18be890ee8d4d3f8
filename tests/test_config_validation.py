"""Engine-capability edges must be rejected at Trainer construction with a
typed error, not surface as a mid-round assert (VERDICT round-4 item 7)."""

import pytest

from fedmlp_tpu.config import Config, DataConfig, MeshConfig
from fedmlp_tpu.train import Trainer


def _cfg(**kw):
    base = dict(
        algorithm="fedavg", model="smallcnn", batch_size=8, base_lr=1e-3,
        n_clients=2, rounds_warmup=1, eval_every=100, seed=5,
        data=DataConfig(name="synthetic", n_classes=4, image_size=32,
                        synthetic_train_size=32, synthetic_test_size=8),
        compute_dtype="float32", output_dir="",
    )
    base.update(kw)
    return Config(**base)


def test_cstate_algorithm_rejects_data_sharding():
    cfg = _cfg(algorithm="rofl", mesh=MeshConfig(data_axis=2))
    with pytest.raises(ValueError, match="post_step.*data"):
        Trainer(cfg)


def test_lockstep_on_rejects_data_sharding():
    cfg = _cfg(batched_global="on", mesh=MeshConfig(data_axis=2))
    with pytest.raises(ValueError, match="lockstep.*data_axis"):
        Trainer(cfg)


def test_stacked_on_rejects_host_stream():
    data = DataConfig(name="synthetic", n_classes=4, image_size=32,
                      synthetic_train_size=32, synthetic_test_size=8,
                      host_stream=True)
    cfg = _cfg(client_stacking="on", data=data)
    with pytest.raises(ValueError, match="client_stacking.*host_stream"):
        Trainer(cfg)
