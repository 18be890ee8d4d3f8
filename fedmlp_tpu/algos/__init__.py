"""Federated algorithm registry."""

from fedmlp_tpu.algos import (
    cbafed,
    fedavg,
    fedirm,
    fedlsr,
    fedmlp,
    fednoro,
    fixmatch,
    rofl,
    rscfed,
)

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
register("fednoro", fednoro)
register("cbafed", cbafed)
register("fixmatch", fixmatch)
register("fedlsr", fedlsr)
register("rscfed", rscfed)
register("fedirm", fedirm)
register("rofl", rofl)
