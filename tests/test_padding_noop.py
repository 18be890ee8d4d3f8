"""Zero-valid (padding) local steps must be TRUE no-ops.

The reference's smaller clients simply run fewer steps per epoch
(reference: utils/local_training.py:920-923). The engines give every client
the same static S = local_ep * max_k ceil(n_k/B) steps, with all-invalid
padding steps for the smaller clients — so a padding step must leave the
client's params, BN running stats AND optimizer state (Adam moments and
step count) untouched, or ragged + local_ep>1 runs silently drift from the
reference trajectory.

Test: run one client through a hand-built padded plan (S=6, steps 2 and 5
all-invalid — the make_batch_plan layout for a 3-sample client at B=2,
local_ep=2 next to a 5-sample sibling) and through the compact plan with
the padding steps removed (S=4, same real batches). With augmentation
pinned to 'normonly' (no RNG consumption) and a dropout-free f32 model the
two trajectories must match BITWISE, including the Adam state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fedmlp_tpu.algos import fedavg
from fedmlp_tpu.models import build_model
from fedmlp_tpu.models.factory import init_model
from fedmlp_tpu.parallel import fl_runtime as rt

C = 4
B = 2
IMG = 32


def _fixture(seed=0):
    rng = np.random.RandomState(seed)
    images = rng.randint(0, 256, size=(8, IMG, IMG, 3), dtype=np.uint8)
    labels = (rng.rand(8, C) > 0.5).astype(np.float32)
    model = build_model("smallcnn", C, compute_dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(seed), IMG, batch=2)
    svars = rt.broadcast_to_clients(variables, 1)
    return images, labels, model, svars


def _plans(images, labels):
    """(padded S=6 with steps {2,5} invalid, compact S=4) plans over the
    same 3-sample client: per-epoch batches [(0,1), (2,pad)] + one all-pad
    step in the padded layout."""
    real = [(0, 1), (2, 0)]  # second batch ragged: one valid + repeat-pad
    real_valid = [(True, True), (True, False)]

    def build(step_idx):
        S = len(step_idx)
        pos = np.zeros((S, 1, B), np.int32)
        val = np.zeros((S, 1, B), bool)
        for s, ri in enumerate(step_idx):
            if ri is None:
                continue  # all-invalid padding step (pos stays 0)
            pos[s, 0] = real[ri % 2]
            val[s, 0] = real_valid[ri % 2]
        imgs = images[pos]  # [S, 1, B, H, W, 3]
        sample = {"labels": jnp.asarray(labels[pos])}
        return {
            "images": jnp.asarray(imgs),
            "sample": sample,
            "pos": jnp.asarray(pos),
            "pos_valid": jnp.asarray(val),
            "key": jax.random.PRNGKey(11),
            "iter0": 0.0,
        }

    padded = build([0, 1, None, 2, 3, None])
    compact = build([0, 1, 2, 3])
    return padded, compact


def _data(svars):
    ctx = {"loss_w": jnp.ones((1, C), jnp.float32)}
    gv = jax.tree_util.tree_map(lambda x: x[0], svars)
    return {"ctx": ctx, "global_vars": gv}


def _adam_counts(opt):
    return [np.asarray(l) for l in jax.tree_util.tree_leaves(opt)
            if np.asarray(l).dtype == np.int32]


@pytest.mark.parametrize("engine", ["mapped", "lockstep"])
def test_padding_steps_are_noops(engine):
    images, labels, model, svars = _fixture()
    padded, compact = _plans(images, labels)
    kw = dict(
        lr=1e-3, batch_size=B, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
        view_mode="single", needs_global=False, donate=False,
        augment_backend="normonly",
    )
    if engine == "mapped":
        round_fn = rt.make_local_round(model, fedavg.loss_fn, **kw)
    else:
        round_fn = rt.make_lockstep_local_round(model, fedavg.loss_fn, **kw)

    outs = {}
    for name, plan in [("padded", padded), ("compact", compact)]:
        state = {"vars": svars}
        state.update(jax.device_get(
            round_fn.init_carry(svars, plan["key"], 0.0)))
        state["vars"] = svars
        out_state, losses, _ = round_fn(state, _data(svars), plan, {})
        outs[name] = jax.device_get((out_state, losses))

    (st_p, loss_p), (st_c, loss_c) = outs["padded"], outs["compact"]
    # params + BN stats bitwise equal
    for a, b in zip(jax.tree_util.tree_leaves(st_p["vars"]),
                    jax.tree_util.tree_leaves(st_c["vars"])):
        np.testing.assert_array_equal(a, b)
    # Adam state bitwise equal — moments did not decay and the step count
    # did not increment on the two padding steps
    for a, b in zip(jax.tree_util.tree_leaves(st_p["opt"]),
                    jax.tree_util.tree_leaves(st_c["opt"])):
        np.testing.assert_array_equal(a, b)
    counts = _adam_counts(st_p["opt"])
    assert counts and all((c == 4).all() for c in counts), (
        f"Adam count must equal the 4 REAL steps, got {counts}"
    )
    # loss accounting identical (padding steps contribute nothing)
    np.testing.assert_array_equal(st_p["loss_sum"], st_c["loss_sum"])
    np.testing.assert_array_equal(st_p["cnt"], st_c["cnt"])
    np.testing.assert_array_equal(loss_p, loss_c)
