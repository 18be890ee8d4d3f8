"""Fused conv1x1+BN-stats prototype (tools/fused_conv_bn.py, retired from the package after measuring at parity forward / negative backward — BENCH_NOTES.md round-3): output and
channel statistics must match the unfused reference. Interpret mode
exercises the same kernel the TPU compiles (round-3 roadmap item 1,
BENCH_NOTES.md)."""

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from fused_conv_bn import conv1x1_bn_stats  # noqa: E402


def test_fused_conv_bn_stats_matches_reference():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2048, 16), jnp.float32)
    w = jnp.asarray(rs.randn(16, 96), jnp.float32)
    y, s, ss = conv1x1_bn_stats(x, w, tile_m=512, interpret=True)
    yr = x @ w
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(yr.sum(0)),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ss), np.asarray((yr ** 2).sum(0)),
                               rtol=1e-4, atol=1e-2)
    # mean/var derived from the accumulators reproduce BN batch stats
    n = x.shape[0]
    mean = np.asarray(s) / n
    var = np.asarray(ss) / n - mean ** 2
    np.testing.assert_allclose(mean, np.asarray(yr.mean(0)), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(var, np.asarray(yr.var(0)), rtol=1e-3,
                               atol=1e-3)
