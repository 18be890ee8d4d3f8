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
