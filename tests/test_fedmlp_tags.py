"""Equivalence test for the vectorized _update_tags.

The reference semantics (utils/local_training.py:1066-1112) are a per
(client, missing-class) loop: among the untagged pool sorted by score
ascending, tag the bottom noise_threshold·|score<0| as noise (2) and the
top clean_threshold·|score>=0| as clean (1). The vectorized version in
algos/fedmlp.py must match that loop bit-for-bit, including accumulation
across rounds (tagged samples leave the pool).
"""

import numpy as np
import pytest
from types import SimpleNamespace

from fedmlp_tpu.algos.fedmlp import _update_tags


def _loop_update_tags(tags, scores, order, valid, active, cfg, tao):
    """Straight transcription of the per-(k,c) loop semantics."""
    K, M, C = tags.shape
    for k in range(K):
        for c in range(C):
            if active[k, c]:
                continue
            pool = valid[k] & (tags[k, :, c] == 0)
            s = scores[k, :, c]
            if cfg.difficulty_estimate:
                t = max(float(tao[c]), cfg.tao_min)
                clean_frac, noise_frac = t, t
            else:
                clean_frac, noise_frac = cfg.clean_threshold, cfg.noise_threshold
            clean_n = int(clean_frac * int((pool & (s >= 0)).sum()))
            noise_n = int(noise_frac * int((pool & (s < 0)).sum()))
            ordered = order[k, :, c]
            sel = ordered[pool[ordered]]
            if len(sel) == 0:
                continue
            if noise_n > 0:
                tags[k, sel[:noise_n], c] = 2
            if clean_n > 0:
                tags[k, sel[-clean_n:], c] = 1


def _mk_trainer(tags, valid, active, cfg, tao):
    return SimpleNamespace(
        server_state={"tags": tags, "tao": tao},
        cfg=SimpleNamespace(fedmlp=cfg),
        fd=SimpleNamespace(valid=valid, active=active),
    )


@pytest.mark.parametrize("difficulty", [0, 1])
def test_update_tags_matches_loop(difficulty):
    rng = np.random.default_rng(0)
    K, M, C = 4, 97, 5
    valid = rng.random((K, M)) < 0.9
    active = np.zeros((K, C), bool)
    for k in range(K):
        active[k, k % C] = True
    cfg = SimpleNamespace(
        difficulty_estimate=difficulty,
        clean_threshold=0.1,
        noise_threshold=0.15,
        tao_min=0.05,
    )
    tao = rng.random(C).astype(np.float32) * 0.3

    tags_vec = np.zeros((K, M, C), np.int8)
    tags_loop = np.zeros((K, M, C), np.int8)
    trainer = _mk_trainer(tags_vec, valid, active, cfg, tao)

    # multiple rounds: tags accumulate and shrink the pool
    for rnd in range(4):
        scores = rng.standard_normal((K, M, C)).astype(np.float32)
        # inject ties to exercise stable-sort equivalence
        scores[:, ::7, :] = 0.25
        order = np.argsort(scores, axis=1, kind="stable")
        _update_tags(trainer, scores, order)
        _loop_update_tags(tags_loop, scores, order, valid, active, cfg, tao)
        np.testing.assert_array_equal(tags_vec, tags_loop)
        # invariants: never tag invalid or active cells
        assert not (tags_vec[~valid][:] != 0).any()
        assert not (tags_vec.transpose(0, 2, 1)[active] != 0).any()


def test_update_tags_empty_pool_noop():
    K, M, C = 2, 10, 3
    cfg = SimpleNamespace(difficulty_estimate=0, clean_threshold=1.0,
                          noise_threshold=1.0, tao_min=0.1)
    valid = np.zeros((K, M), bool)  # nothing valid
    active = np.zeros((K, C), bool)
    tags = np.zeros((K, M, C), np.int8)
    trainer = _mk_trainer(tags, valid, active, cfg, np.zeros(C, np.float32))
    scores = np.ones((K, M, C), np.float32)
    order = np.argsort(scores, axis=1, kind="stable")
    _update_tags(trainer, scores, order)
    assert (tags == 0).all()
