"""Shared fixture + init for the head-to-head reference parity run.

Both sides (the vendored-import PyTorch reference driver and fedmlp_tpu)
train on EXACTLY the same data: one synthetic learnable fixture, the same
seed-1037 IID partition, the same all-positives-hidden label masking, and
the same initial ResNet18 weights (torch default init, converted to flax
via tools/convert_torch_weights.convert_resnet). Augmentation is disabled
on both sides (normalize only) so the only remaining nondeterminism is
DataLoader shuffling order vs our batch-plan permutations.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "outputs", "ref_parity")

# protocol constants (small enough for the 1-core host, big enough to learn)
SEED = 1037
N_TRAIN, N_TEST = 240, 80
N_CLASSES = 5          # ICH-shaped: 5 classes, 5 clients, client i ↔ class i
N_CLIENTS = 5
IMAGE = 64
BATCH = 16
LOCAL_EP = 1
BASE_LR = 1e-4
ROUNDS = 12
STAGE1 = 6             # FedMLP stage-1 rounds
EVAL_EVERY = 3
MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def fixture():
    """(train_images u8, train_targets, test_images, test_targets,
    dict_users, hidden) — deterministic from SEED."""
    from fedmlp_tpu.data.datasets import make_synthetic_dataset
    from fedmlp_tpu.data.masking import build_hidden_mask
    from fedmlp_tpu.data.partition import iid_sampling

    tr = make_synthetic_dataset(N_TRAIN, N_CLASSES, IMAGE, seed=SEED)
    te = make_synthetic_dataset(N_TEST, N_CLASSES, IMAGE, seed=SEED + 1)
    dict_users = iid_sampling(N_TRAIN, N_CLIENTS, SEED)
    hidden = build_hidden_mask(tr.targets, 0.0, np.random.RandomState(SEED))
    return tr, te, dict_users, hidden


def ensure_init():
    """Create (once) the shared torch init state_dict + its flax .npz."""
    import torch

    os.makedirs(OUT, exist_ok=True)
    pt = os.path.join(OUT, "resnet18_init.pt")
    npz = os.path.join(OUT, "resnet18_init.npz")
    if os.path.exists(pt) and os.path.exists(npz):
        return pt, npz
    from tools.ref_parity.torch_resnet18 import TorchResNet18
    from tools.convert_torch_weights import convert_resnet, flatten

    torch.manual_seed(SEED)
    net = TorchResNet18(N_CLASSES)
    torch.save(net.state_dict(), pt)
    state = {k: v.numpy() for k, v in net.state_dict().items()}
    tree = convert_resnet(state, [2, 2, 2, 2])
    # the converter leaves the classifier head fresh (ImageNet head surgery
    # semantics); for the parity run both sides must share the SAME head
    tree["params"]["head"] = {"fc": {
        "kernel": state["fc.weight"].T.copy(),
        "bias": state["fc.bias"].copy(),
    }}
    np.savez(npz, **flatten(tree))
    return pt, npz


def write_jsonl(path, records):
    import json

    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
