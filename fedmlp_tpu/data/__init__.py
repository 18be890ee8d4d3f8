from fedmlp_tpu.data.partition import iid_sampling, non_iid_dirichlet_sampling
from fedmlp_tpu.data.masking import (
    build_hidden_mask,
    build_client_index_table,
    observed_targets,
)
from fedmlp_tpu.data.datasets import (
    ArrayDataset,
    make_synthetic_dataset,
    load_csv_png_dataset,
    load_packed_dataset,
)

__all__ = [
    "iid_sampling",
    "non_iid_dirichlet_sampling",
    "build_hidden_mask",
    "build_client_index_table",
    "observed_targets",
    "ArrayDataset",
    "make_synthetic_dataset",
    "load_csv_png_dataset",
    "load_packed_dataset",
]
