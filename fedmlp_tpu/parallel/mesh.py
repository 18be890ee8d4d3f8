"""Device mesh + sharding utilities.

The framework's core parallel design (SURVEY.md §2.9): the reference trains
clients *sequentially* in a Python loop (reference: main.py:135); here the
whole client population is a pytree stacked on a leading ``client`` axis,
sharded over the mesh. Local training of all clients is then ONE SPMD
program, and FedAvg becomes a weighted reduction over the client axis whose
cross-device part XLA lowers to psum over ICI.

Mesh axes:
  client — federated clients (primary axis)
  data   — per-client batch data-parallelism (optional, defaults to 1)
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_client_shards: int | None = None, data_shards: int = 1,
              devices=None) -> Mesh:
    """Build Mesh(('client', 'data')). ``n_client_shards`` defaults to
    n_devices // data_shards. The number of clients does not have to equal
    the client-shard count — stacked arrays shard as long as n_clients is
    divisible by it (pad clients otherwise)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_client_shards is None or n_client_shards <= 0:
        n_client_shards = max(1, n // data_shards)
    assert n_client_shards * data_shards <= n, (
        f"mesh {n_client_shards}x{data_shards} needs more than {n} devices"
    )
    devices = devices[: n_client_shards * data_shards]
    return Mesh(devices.reshape(n_client_shards, data_shards), ("client", "data"))


def client_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays with a leading client axis."""
    return NamedSharding(mesh, P("client"))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the whole mesh (global params, masks)."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_stacked(mesh: Mesh, tree):
    """Place a stacked-on-client-axis pytree with axis 0 sharded over the
    ``client`` mesh axis, everything else replicated."""
    s = NamedSharding(mesh, P("client"))
    return jax.device_put(tree, s)


def pad_clients(n_clients: int, n_shards: int) -> int:
    """Smallest padded client count divisible by the shard count."""
    return ((n_clients + n_shards - 1) // n_shards) * n_shards
