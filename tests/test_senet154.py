"""SENet-154 fidelity: param-count and forward agreement against a torch
replica of ``pretrainedmodels.senet154`` (the model the reference loads at
model/all_models.py:77-78). torch (CPU) is in the image; pretrainedmodels
itself is not, so the replica below re-states the published topology."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from fedmlp_tpu.models import build_model  # noqa: E402
from fedmlp_tpu.models.factory import count_params, init_model  # noqa: E402


class TorchSEModule(tnn.Module):
    def __init__(self, ch, reduction):
        super().__init__()
        self.fc1 = tnn.Conv2d(ch, ch // reduction, 1)
        self.fc2 = tnn.Conv2d(ch // reduction, ch, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))
        return x * s


class TorchSEBottleneck(tnn.Module):
    """pretrainedmodels.SEBottleneck: 1x1 -> planes*2, grouped 3x3 ->
    planes*4 (groups=64), 1x1 -> planes*4, SE, residual."""

    def __init__(self, inplanes, planes, stride=1, downsample_kernel=0,
                 groups=64, reduction=16):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes * 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes * 2)
        self.conv2 = tnn.Conv2d(planes * 2, planes * 4, 3, stride=stride,
                                padding=1, groups=groups, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes * 4)
        self.conv3 = tnn.Conv2d(planes * 4, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.se_module = TorchSEModule(planes * 4, reduction)
        self.downsample_conv = self.downsample_bn = None
        if downsample_kernel:
            self.downsample_conv = tnn.Conv2d(
                inplanes, planes * 4, downsample_kernel, stride=stride,
                padding=(downsample_kernel - 1) // 2, bias=False)
            self.downsample_bn = tnn.BatchNorm2d(planes * 4)

    def forward(self, x):
        r = x
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        y = self.se_module(y)
        if self.downsample_conv is not None:
            r = self.downsample_bn(self.downsample_conv(x))
        return torch.relu(y + r)


class TorchSENet154(tnn.Module):
    def __init__(self, num_classes):
        super().__init__()
        self.stem_conv1 = tnn.Conv2d(3, 64, 3, stride=2, padding=1, bias=False)
        self.stem_bn1 = tnn.BatchNorm2d(64)
        self.stem_conv2 = tnn.Conv2d(64, 64, 3, padding=1, bias=False)
        self.stem_bn2 = tnn.BatchNorm2d(64)
        self.stem_conv3 = tnn.Conv2d(64, 128, 3, padding=1, bias=False)
        self.stem_bn3 = tnn.BatchNorm2d(128)
        self.pool0 = tnn.MaxPool2d(3, stride=2, ceil_mode=True)
        inplanes = 128
        for i, (blocks, planes) in enumerate(
                zip((3, 8, 36, 3), (64, 128, 256, 512))):
            for j in range(blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                dk = (1 if i == 0 else 3) if j == 0 else 0
                setattr(self, f"layer{i + 1}_{j}",
                        TorchSEBottleneck(inplanes, planes, stride, dk))
                inplanes = planes * 4
        self.head_fc = tnn.Linear(2048, num_classes)

    def forward(self, x):
        y = torch.relu(self.stem_bn1(self.stem_conv1(x)))
        y = torch.relu(self.stem_bn2(self.stem_conv2(y)))
        y = torch.relu(self.stem_bn3(self.stem_conv3(y)))
        y = self.pool0(y)
        for i, blocks in enumerate((3, 8, 36, 3)):
            for j in range(blocks):
                y = getattr(self, f"layer{i + 1}_{j}")(y)
        feat = y.mean(dim=(2, 3))
        return feat, self.head_fc(feat)


def _flax_leaf(variables, torch_name):
    """torch param/buffer name -> flax leaf array."""
    parts = torch_name.split(".")
    leaf = parts[-1]
    coll = "params"
    if leaf == "weight":
        key = "scale" if "bn" in parts[-2] else "kernel"
    elif leaf == "bias":
        key = "bias"
    elif leaf == "running_mean":
        coll, key = "batch_stats", "mean"
    elif leaf == "running_var":
        coll, key = "batch_stats", "var"
    else:
        raise KeyError(torch_name)
    node = variables[coll]
    path = parts[:-1]
    if path == ["head_fc"]:
        path = ["head", "fc"]
    for p in path:
        node = node[p]
    return node[key]


@pytest.fixture(scope="module")
def models():
    flax_model = build_model("senet154", num_classes=5,
                             compute_dtype=jnp.float32)
    variables = init_model(flax_model, jax.random.PRNGKey(0), 64, batch=2)
    tm = TorchSENet154(num_classes=5).eval()
    return flax_model, variables, tm


def test_param_count_matches_torch(models):
    _, variables, tm = models
    torch_n = sum(p.numel() for p in tm.parameters())
    assert count_params(variables) == torch_n
    # published senet154 size at 1000 classes: swap the 5-way head
    assert torch_n - (2048 + 1) * 5 + (2048 + 1) * 1000 == 115_088_984


def test_forward_agreement(models):
    flax_model, variables, tm = models
    with torch.no_grad():
        for name, p in list(tm.named_parameters()) + list(tm.named_buffers()):
            if name.endswith("num_batches_tracked"):
                continue
            src = np.asarray(_flax_leaf(variables, name), np.float32)
            if src.ndim == 4:    # HWIO -> OIHW (grouped convs included)
                src = src.transpose(3, 2, 0, 1)
            elif src.ndim == 2:  # dense kernel (in, out) -> (out, in)
                src = src.T
            assert tuple(p.shape) == src.shape, name
            p.copy_(torch.from_numpy(src))
        x = np.random.RandomState(7).rand(2, 64, 64, 3).astype(np.float32)
        tf, tl = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ff, fl = flax_model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ff), tf.numpy(), atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(fl), tl.numpy(), atol=2e-3, rtol=2e-3)


def test_train_mode_dropout(models):
    flax_model, variables, _ = models
    x = jnp.ones((2, 64, 64, 3), jnp.float32)
    (f1, _), _ = flax_model.apply(variables, x, train=True,
                                  mutable=["batch_stats"],
                                  rngs={"dropout": jax.random.PRNGKey(1)})
    (f2, _), _ = flax_model.apply(variables, x, train=True,
                                  mutable=["batch_stats"],
                                  rngs={"dropout": jax.random.PRNGKey(2)})
    # dropout active in train mode: different rngs -> different features
    assert not np.allclose(np.asarray(f1), np.asarray(f2))
    # eval is deterministic and needs no rng
    f3, _ = flax_model.apply(variables, x, train=False)
    f4, _ = flax_model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(f3), np.asarray(f4))
