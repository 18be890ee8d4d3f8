from fedmlp_tpu.utils.logging import set_output_files, MetricWriter, set_seed
from fedmlp_tpu.utils.checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "set_output_files",
    "MetricWriter",
    "set_seed",
    "save_checkpoint",
    "load_checkpoint",
]
