from fedmlp_tpu.fl.aggregate import (
    fedavg,
    fed_w,
    rscfed,
    model_dist,
    fedavg_tao,
    fedavg_proto,
    fedavg_rela,
    daagg,
)

__all__ = [
    "fedavg",
    "fed_w",
    "rscfed",
    "model_dist",
    "fedavg_tao",
    "fedavg_proto",
    "fedavg_rela",
    "daagg",
]
