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


def _conv(w):  # OIHW → HWIO (works for grouped/depthwise too)
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _put(tree, path, val):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(val)


def convert_efficientnet(state: dict, variant: str) -> dict:
    """efficientnet-pytorch (lukemelas) state_dict → flax trees matching
    fedmlp_tpu.models.efficientnet naming (the reference loads these
    checkpoints via EfficientNet.from_pretrained, reference:
    model/efficientnet.py:28-89). The _fc head is skipped (head surgery)."""
    from fedmlp_tpu.models.efficientnet import (_B0_BLOCKS, _SCALING,
                                                _round_repeats)

    _, depth_mult, _, _ = _SCALING[variant]
    params: dict = {}
    stats: dict = {}

    def bn(dst, src):
        _put(params, dst + ("scale",), state[f"{src}.weight"])
        _put(params, dst + ("bias",), state[f"{src}.bias"])
        _put(stats, dst + ("mean",), state[f"{src}.running_mean"])
        _put(stats, dst + ("var",), state[f"{src}.running_var"])

    _put(params, ("stem_conv", "kernel"), _conv(state["_conv_stem.weight"]))
    bn(("stem_bn",), "_bn0")
    g = 0
    for bi, (_expand, _ch, reps, _stride, _kernel) in enumerate(_B0_BLOCKS):
        for r in range(_round_repeats(reps, depth_mult)):
            src, dst = f"_blocks.{g}", f"block{bi}_{r}"
            if f"{src}._expand_conv.weight" in state:
                _put(params, (dst, "expand_conv", "kernel"),
                     _conv(state[f"{src}._expand_conv.weight"]))
                bn((dst, "expand_bn"), f"{src}._bn0")
            _put(params, (dst, "dw_conv", "kernel"),
                 _conv(state[f"{src}._depthwise_conv.weight"]))
            bn((dst, "dw_bn"), f"{src}._bn1")
            for se in ("se_reduce", "se_expand"):
                _put(params, (dst, se, "kernel"),
                     _conv(state[f"{src}._{se}.weight"]))
                _put(params, (dst, se, "bias"), state[f"{src}._{se}.bias"])
            _put(params, (dst, "project_conv", "kernel"),
                 _conv(state[f"{src}._project_conv.weight"]))
            bn((dst, "project_bn"), f"{src}._bn2")
            g += 1
    _put(params, ("head_conv", "kernel"), _conv(state["_conv_head.weight"]))
    bn(("head_bn",), "_bn1")
    return {"params": params, "batch_stats": stats}


def convert_senet154(state: dict) -> dict:
    """pretrainedmodels senet154 state_dict → flax trees matching
    fedmlp_tpu.models.senet naming (reference: model/all_models.py:77-78).
    last_linear is skipped (head surgery)."""
    params: dict = {}
    stats: dict = {}

    def bn(dst, src):
        _put(params, dst + ("scale",), state[f"{src}.weight"])
        _put(params, dst + ("bias",), state[f"{src}.bias"])
        _put(stats, dst + ("mean",), state[f"{src}.running_mean"])
        _put(stats, dst + ("var",), state[f"{src}.running_var"])

    for i in (1, 2, 3):
        _put(params, (f"stem_conv{i}", "kernel"),
             _conv(state[f"layer0.conv{i}.weight"]))
        bn((f"stem_bn{i}",), f"layer0.bn{i}")
    for li, blocks in enumerate((3, 8, 36, 3)):
        for bi in range(blocks):
            src, dst = f"layer{li + 1}.{bi}", f"layer{li + 1}_{bi}"
            for ci in (1, 2, 3):
                _put(params, (dst, f"conv{ci}", "kernel"),
                     _conv(state[f"{src}.conv{ci}.weight"]))
                bn((dst, f"bn{ci}"), f"{src}.bn{ci}")
            for fc in ("fc1", "fc2"):
                _put(params, (dst, "se_module", fc, "kernel"),
                     _conv(state[f"{src}.se_module.{fc}.weight"]))
                _put(params, (dst, "se_module", fc, "bias"),
                     state[f"{src}.se_module.{fc}.bias"])
            if f"{src}.downsample.0.weight" in state:
                _put(params, (dst, "downsample_conv", "kernel"),
                     _conv(state[f"{src}.downsample.0.weight"]))
                bn((dst, "downsample_bn"), f"{src}.downsample.1")
    return {"params": params, "batch_stats": stats}


def convert_vgg(state: dict, variant: str) -> dict:
    """torchvision VGG (no-BN) state_dict → flax trees matching
    fedmlp_tpu.models.vgg naming (reference: model/all_models.py:45-52).
    classifier.6 is skipped (head surgery); classifier.0's weight is
    re-laid-out from torch's channel-major flatten (C,7,7) to NHWC's
    (7,7,C)."""
    from fedmlp_tpu.models.vgg import _CFGS

    params: dict = {}
    seq = 0  # torchvision Sequential index: conv+relu = 2 slots, pool = 1
    ci = 0
    for v in _CFGS[variant]:
        if v == "M":
            seq += 1
            continue
        _put(params, (f"conv{ci}", "kernel"),
             _conv(state[f"features.{seq}.weight"]))
        _put(params, (f"conv{ci}", "bias"), state[f"features.{seq}.bias"])
        seq += 2
        ci += 1
    w0 = np.asarray(state["classifier.0.weight"])  # [4096, 512*7*7] CHW-major
    w0 = w0.reshape(4096, 512, 7, 7).transpose(2, 3, 1, 0).reshape(-1, 4096)
    _put(params, ("fc1", "kernel"), w0)
    _put(params, ("fc1", "bias"), state["classifier.0.bias"])
    _put(params, ("fc2", "kernel"), np.asarray(state["classifier.3.weight"]).T)
    _put(params, ("fc2", "bias"), state["classifier.3.bias"])
    return {"params": params}


def convert_densenet(state: dict, variant: str) -> dict:
    """torchvision DenseNet state_dict → flax trees matching
    fedmlp_tpu.models.densenet naming (reference: model/all_models.py:63-70).
    classifier is skipped (head surgery)."""
    from fedmlp_tpu.models.densenet import _CFGS

    _growth, blocks, _stem = _CFGS[variant]
    params: dict = {}
    stats: dict = {}

    def bn(dst, src):
        _put(params, dst + ("scale",), state[f"{src}.weight"])
        _put(params, dst + ("bias",), state[f"{src}.bias"])
        _put(stats, dst + ("mean",), state[f"{src}.running_mean"])
        _put(stats, dst + ("var",), state[f"{src}.running_var"])

    _put(params, ("stem_conv", "kernel"), _conv(state["features.conv0.weight"]))
    bn(("stem_bn",), "features.norm0")
    for bi, n_layers in enumerate(blocks):
        for li in range(n_layers):
            src = f"features.denseblock{bi + 1}.denselayer{li + 1}"
            dst = f"block{bi}_layer{li}"
            bn((dst, "bn1"), f"{src}.norm1")
            _put(params, (dst, "conv1", "kernel"),
                 _conv(state[f"{src}.conv1.weight"]))
            bn((dst, "bn2"), f"{src}.norm2")
            _put(params, (dst, "conv2", "kernel"),
                 _conv(state[f"{src}.conv2.weight"]))
        if bi != len(blocks) - 1:
            bn((f"trans{bi}_bn",), f"features.transition{bi + 1}.norm")
            _put(params, (f"trans{bi}_conv", "kernel"),
                 _conv(state[f"features.transition{bi + 1}.conv.weight"]))
    bn(("final_bn",), "features.norm5")
    return {"params": params, "batch_stats": stats}


def convert(model_name: str, state: dict) -> dict:
    """Dispatch by model name (factory spellings accepted)."""
    name = model_name.lower()
    if name.startswith("resnet"):
        return convert_resnet(state, _STAGES[name])
    if name.startswith(("efficient_b", "efficientnet_b")):
        return convert_efficientnet(state, "b" + name[-1])
    if name == "senet154":
        return convert_senet154(state)
    if name.startswith("vgg"):
        return convert_vgg(state, name)
    if name.startswith(("dense", "densenet")):
        return convert_densenet(state, "densenet" + name.lstrip("densenet"))
    raise ValueError(f"no converter for {model_name}")


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
    if "state_dict" in state:  # checkpoint wrapper
        state = state["state_dict"]
    state = {k: v.numpy() for k, v in state.items()}
    tree = convert(model_name, state)
    np.savez(out, **flatten(tree))
    print(f"wrote {out} ({len(flatten(tree))} arrays)")


if __name__ == "__main__":
    main()
