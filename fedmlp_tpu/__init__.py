"""fedmlp_tpu — a TPU-native federated multi-label learning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
FedMLP codebase (MICCAI'24, "FedMLP: Federated Multi-Label Medical Image
Classification under Task Heterogeneity"). The reference is a single-GPU
PyTorch simulation that trains clients sequentially; this framework keeps the
entire client population resident on a TPU mesh: client model replicas are
stacked on a leading ``client`` axis, local training steps run as one jitted
SPMD program, and server aggregation (FedAvg and friends) is an on-device
weighted reduction over the client axis.

Public surface:
    fedmlp_tpu.config      — typed configuration mirroring the reference CLI
    fedmlp_tpu.data        — datasets, partitioning, label masking, pipelines
    fedmlp_tpu.models      — Flax backbones with (feature, logits) forward
    fedmlp_tpu.ops         — losses, similarity, device-side augmentation
    fedmlp_tpu.fl          — server aggregation rules
    fedmlp_tpu.algos       — the 9 federated algorithms
    fedmlp_tpu.eval        — multi-label metrics + global/class test
    fedmlp_tpu.train       — the round-loop trainer
"""

__version__ = "0.1.0"

from fedmlp_tpu.config import Config  # noqa: F401
