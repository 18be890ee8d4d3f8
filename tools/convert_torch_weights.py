#!/usr/bin/env python
"""Convert a torchvision-style ResNet state_dict (.pth) to fedmlp_tpu Flax
variables (ImageNet init support, reference: model/all_models.py:39-62
``pretrained=True``; no network access is required — point at a local file).

Usage:
  python tools/convert_torch_weights.py resnet18 resnet18-imagenet.pth out.npz
  # then: Trainer(..., pretrained_path='out.npz') or factory.load_pretrained
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def convert_resnet(state: dict, stage_sizes) -> dict:
    """torchvision resnet state_dict → flax param/batch_stats trees matching
    fedmlp_tpu.models.resnet naming."""

    def conv(w):  # OIHW → HWIO
        return np.transpose(np.asarray(w), (2, 3, 1, 0))

    params: dict = {}
    stats: dict = {}

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(val)

    put(params, ("stem_conv", "kernel"), conv(state["conv1.weight"]))
    put(params, ("stem_bn", "scale"), state["bn1.weight"])
    put(params, ("stem_bn", "bias"), state["bn1.bias"])
    put(stats, ("stem_bn", "mean"), state["bn1.running_mean"])
    put(stats, ("stem_bn", "var"), state["bn1.running_var"])

    basic = "layer1.0.conv3.weight" not in state
    n_convs = 2 if basic else 3
    for li, blocks in enumerate(stage_sizes):
        for bi in range(blocks):
            src = f"layer{li + 1}.{bi}"
            dst = f"layer{li + 1}_{bi}"
            for ci in range(n_convs):
                put(params, (dst, f"Conv_{ci}", "kernel"),
                    conv(state[f"{src}.conv{ci + 1}.weight"]))
                put(params, (dst, f"BatchNorm_{ci}", "scale"),
                    state[f"{src}.bn{ci + 1}.weight"])
                put(params, (dst, f"BatchNorm_{ci}", "bias"),
                    state[f"{src}.bn{ci + 1}.bias"])
                put(stats, (dst, f"BatchNorm_{ci}", "mean"),
                    state[f"{src}.bn{ci + 1}.running_mean"])
                put(stats, (dst, f"BatchNorm_{ci}", "var"),
                    state[f"{src}.bn{ci + 1}.running_var"])
            if f"{src}.downsample.0.weight" in state:
                put(params, (dst, "downsample_conv", "kernel"),
                    conv(state[f"{src}.downsample.0.weight"]))
                put(params, (dst, "downsample_bn", "scale"),
                    state[f"{src}.downsample.1.weight"])
                put(params, (dst, "downsample_bn", "bias"),
                    state[f"{src}.downsample.1.bias"])
                put(stats, (dst, "downsample_bn", "mean"),
                    state[f"{src}.downsample.1.running_mean"])
                put(stats, (dst, "downsample_bn", "var"),
                    state[f"{src}.downsample.1.running_var"])
    # classifier head is re-initialized for n_classes (head surgery,
    # reference model/all_models.py:99-130) — intentionally not converted
    return {"params": params, "batch_stats": stats}


_STAGES = {
    "resnet18": [2, 2, 2, 2],
    "resnet34": [3, 4, 6, 3],
    "resnet50": [3, 4, 6, 3],
    "resnet101": [3, 4, 23, 3],
    "resnet152": [3, 8, 36, 3],
}


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = v
    return out


def main():
    model_name, pth, out = sys.argv[1], sys.argv[2], sys.argv[3]
    import torch

    state = torch.load(pth, map_location="cpu")
    state = {k: v.numpy() for k, v in state.items()}
    tree = convert_resnet(state, _STAGES[model_name.lower()])
    np.savez(out, **flatten(tree))
    print(f"wrote {out} ({len(flatten(tree))} arrays)")


if __name__ == "__main__":
    main()
