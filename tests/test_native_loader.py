"""Native packed-shard loader: build, gather parity, async prefetch."""

import numpy as np
import pytest

from fedmlp_tpu.data.native_loader import PackLoader


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    d = tmp_path_factory.mktemp("pack")
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (64, 16, 16, 3), dtype=np.uint8)
    path = str(d / "images.npy")
    np.save(path, arr)
    return path, arr


def test_native_lib_builds(packed):
    path, _ = packed
    ld = PackLoader(path)
    assert ld.native, "native loader must compile and load in this image"
    ld.close()


def test_gather_matches_numpy(packed):
    path, arr = packed
    ld = PackLoader(path)
    idx = np.array([[3, 1], [63, 0]], np.int64)
    got = ld.gather(idx)
    np.testing.assert_array_equal(got, arr[idx])
    ld.close()


def test_gather_bounds_check(packed):
    path, _ = packed
    ld = PackLoader(path)
    if ld.native:
        with pytest.raises(IndexError):
            ld.gather(np.array([64], np.int64))
    ld.close()


def test_async_prefetch_roundtrip(packed):
    path, arr = packed
    ld = PackLoader(path)
    idx1 = np.array([5, 7, 9], np.int64)
    idx2 = np.array([0, 2], np.int64)
    ld.submit(idx1)
    out1 = ld.wait()
    np.testing.assert_array_equal(out1, arr[idx1])
    ld.submit(idx2)
    out2 = ld.wait()
    np.testing.assert_array_equal(out2, arr[idx2])
    ld.close()


def test_host_stream_training_matches_device_path(tmp_path):
    """End-to-end: host-streamed rounds must equal device-resident rounds
    bitwise (same RNG → same batches → same math)."""
    import jax

    from fedmlp_tpu.config import Config, DataConfig
    from fedmlp_tpu.data.datasets import make_synthetic_dataset
    from fedmlp_tpu.train import Trainer

    ds = make_synthetic_dataset(96, 4, 32, seed=5)
    test = make_synthetic_dataset(16, 4, 32, seed=6)
    npy = str(tmp_path / "images.npy")
    np.save(npy, ds.images)

    def cfg(stream):
        return Config(
            algorithm="fedavg", model="smallcnn", batch_size=8,
            base_lr=1e-3, n_clients=4, local_ep=1, rounds_warmup=2,
            eval_every=100, seed=23,
            data=DataConfig(name="synthetic", n_classes=4, image_size=32,
                            host_stream=stream),
            compute_dtype="float32",
        )

    t_dev = Trainer(cfg(False), train_ds=ds, test_ds=test)
    t_str = Trainer(cfg(True), train_ds=ds, test_ds=test, images_npy=npy)
    assert t_str.loader is not None

    r_dev = t_dev.run_round(0)
    r_str = t_str.run_round(0)
    np.testing.assert_allclose(r_str.client_losses, r_dev.client_losses,
                               rtol=1e-5, atol=1e-6)
    leaf_d = np.asarray(
        jax.tree_util.tree_leaves(t_dev.global_vars["params"])[0])
    leaf_s = np.asarray(
        jax.tree_util.tree_leaves(t_str.global_vars["params"])[0])
    np.testing.assert_allclose(leaf_s, leaf_d, rtol=1e-5, atol=1e-6)


def test_host_stream_fedmlp_two_stage(tmp_path):
    """Harvest-based FedMLP streams its prototype passes chunk-by-chunk
    through the native loader's double-buffered prefetch."""
    from fedmlp_tpu.config import Config, DataConfig, FedMLPConfig
    from fedmlp_tpu.data.datasets import make_synthetic_dataset
    from fedmlp_tpu.train import Trainer

    ds = make_synthetic_dataset(96, 4, 32, seed=7)
    test = make_synthetic_dataset(16, 4, 32, seed=8)
    npy = str(tmp_path / "im.npy")
    np.save(npy, ds.images)
    cfg = Config(
        algorithm="fedmlp", model="smallcnn", batch_size=8, base_lr=1e-3,
        n_clients=4, local_ep=1, rounds_warmup=3, eval_every=100, seed=29,
        fedmlp=FedMLPConfig(rounds_stage1=2, clean_threshold=0.2,
                            noise_threshold=0.2),
        data=DataConfig(name="synthetic", n_classes=4, image_size=32,
                        host_stream=True),
        compute_dtype="float32",
    )
    t = Trainer(cfg, train_ds=ds, test_ds=test, images_npy=npy)
    assert t.fd.images is None  # dataset never lands in device memory
    for r in range(3):
        rec = t.run_round(r)
        assert np.isfinite(rec.client_losses).all()
    assert (t.server_state["tags"] > 0).sum() > 0
    assert np.abs(t.server_state["proto"]).sum() > 0
