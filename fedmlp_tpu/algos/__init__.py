"""Federated algorithm registry."""

from fedmlp_tpu.algos import fedavg, fedmlp

_REGISTRY = {}


def register(name, module):
    _REGISTRY[name] = module


def get_algorithm(name: str):
    if name in _REGISTRY:
        return _REGISTRY[name]
    raise KeyError(f"algorithm {name!r} not registered; have {sorted(_REGISTRY)}")


register("fedavg", fedavg)
register("centralized", fedavg)  # single-client degenerate case
register("fedmlp", fedmlp)
