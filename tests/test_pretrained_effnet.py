"""Pretrained-path proof for efficient_b0 and resnet18: fabricate a
real-schema torch state_dict (lukemelas / torchvision key names), run it
through tools/convert_torch_weights → factory.load_pretrained, and assert
the Flax forward agrees with a functional torch re-execution of the same
weights (reference loads these checkpoints at model/all_models.py:53-62,
model/efficientnet.py:28-35)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from fedmlp_tpu.models import build_model  # noqa: E402
from fedmlp_tpu.models.factory import init_model, load_pretrained  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_torch_weights import convert, flatten  # noqa: E402
from test_pretrained import fake_torch_resnet18_state  # noqa: E402

# b0 block plan: (expand, cin, cout, kernel, stride) flattened over repeats
_B0_PLAN = [
    (1, 32, 16, 3, 1),
    (6, 16, 24, 3, 2), (6, 24, 24, 3, 1),
    (6, 24, 40, 5, 2), (6, 40, 40, 5, 1),
    (6, 40, 80, 3, 2), (6, 80, 80, 3, 1), (6, 80, 80, 3, 1),
    (6, 80, 112, 5, 1), (6, 112, 112, 5, 1), (6, 112, 112, 5, 1),
    (6, 112, 192, 5, 2), (6, 192, 192, 5, 1), (6, 192, 192, 5, 1),
    (6, 192, 192, 5, 1),
    (6, 192, 320, 3, 1),
]


def fake_lukemelas_b0_state(rng):
    st = {}

    def w(key, *shape):
        st[key] = (rng.rand(*shape).astype(np.float32) - 0.5) * 0.2

    def bn(prefix, ch):
        st[f"{prefix}.weight"] = rng.rand(ch).astype(np.float32) + 0.5
        st[f"{prefix}.bias"] = (rng.rand(ch).astype(np.float32) - 0.5) * 0.1
        st[f"{prefix}.running_mean"] = (rng.rand(ch).astype(np.float32) - 0.5) * 0.1
        st[f"{prefix}.running_var"] = rng.rand(ch).astype(np.float32) + 0.5

    w("_conv_stem.weight", 32, 3, 3, 3)
    bn("_bn0", 32)
    for g, (expand, cin, cout, k, _s) in enumerate(_B0_PLAN):
        p = f"_blocks.{g}"
        mid = cin * expand
        if expand != 1:
            w(f"{p}._expand_conv.weight", mid, cin, 1, 1)
            bn(f"{p}._bn0", mid)
        w(f"{p}._depthwise_conv.weight", mid, 1, k, k)
        bn(f"{p}._bn1", mid)
        se = max(1, int(cin * 0.25))
        w(f"{p}._se_reduce.weight", se, mid, 1, 1)
        w(f"{p}._se_reduce.bias", se)
        w(f"{p}._se_expand.weight", mid, se, 1, 1)
        w(f"{p}._se_expand.bias", mid)
        w(f"{p}._project_conv.weight", cout, mid, 1, 1)
        bn(f"{p}._bn2", cout)
    w("_conv_head.weight", 1280, 320, 1, 1)
    bn("_bn1", 1280)
    w("_fc.weight", 1000, 1280)
    w("_fc.bias", 1000)
    return st


# ---- functional torch re-execution (eval mode) ----

def _t(a):
    return torch.from_numpy(np.asarray(a))


def _bn(x, st, p, eps):
    return F.batch_norm(x, _t(st[f"{p}.running_mean"]),
                        _t(st[f"{p}.running_var"]), _t(st[f"{p}.weight"]),
                        _t(st[f"{p}.bias"]), False, 0.0, eps)


def _conv_same(x, w, stride, groups=1):
    """TF-SAME padding (lukemelas Conv2dStaticSamePadding)."""
    k = w.shape[-1]
    pads = []
    for n in (x.shape[-1], x.shape[-2]):  # F.pad order: W then H
        out = -(-n // stride)
        total = max(0, (out - 1) * stride + k - n)
        pads += [total // 2, total - total // 2]
    return F.conv2d(F.pad(x, pads), _t(w), stride=stride, groups=groups)


def torch_effb0_forward(st, x_nchw):
    swish = lambda t: t * torch.sigmoid(t)  # noqa: E731
    y = swish(_bn(_conv_same(x_nchw, st["_conv_stem.weight"], 2), st, "_bn0",
                  1e-3))
    for g, (expand, cin, cout, k, s) in enumerate(_B0_PLAN):
        p = f"_blocks.{g}"
        h = y
        mid = cin * expand
        if expand != 1:
            h = swish(_bn(F.conv2d(h, _t(st[f"{p}._expand_conv.weight"])),
                          st, f"{p}._bn0", 1e-3))
        h = swish(_bn(_conv_same(h, st[f"{p}._depthwise_conv.weight"], s,
                                 groups=mid), st, f"{p}._bn1", 1e-3))
        se = swish(F.conv2d(h.mean(dim=(2, 3), keepdim=True),
                            _t(st[f"{p}._se_reduce.weight"]),
                            _t(st[f"{p}._se_reduce.bias"])))
        se = torch.sigmoid(F.conv2d(se, _t(st[f"{p}._se_expand.weight"]),
                                    _t(st[f"{p}._se_expand.bias"])))
        h = _bn(F.conv2d(h * se, _t(st[f"{p}._project_conv.weight"])),
                st, f"{p}._bn2", 1e-3)
        if s == 1 and cin == cout:
            h = h + y
        y = h
    y = swish(_bn(F.conv2d(y, _t(st["_conv_head.weight"])), st, "_bn1", 1e-3))
    return y.mean(dim=(2, 3))


def torch_resnet18_forward(st, x_nchw):
    y = F.conv2d(x_nchw, _t(st["conv1.weight"]), stride=2, padding=3)
    y = torch.relu(_bn(y, st, "bn1", 1e-5))
    y = F.max_pool2d(y, 3, stride=2, padding=1)
    for li, blocks in enumerate([2, 2, 2, 2]):
        for bi in range(blocks):
            p = f"layer{li + 1}.{bi}"
            s = 2 if (li > 0 and bi == 0) else 1
            r = y
            h = torch.relu(_bn(F.conv2d(y, _t(st[f"{p}.conv1.weight"]),
                                        stride=s, padding=1),
                               st, f"{p}.bn1", 1e-5))
            h = _bn(F.conv2d(h, _t(st[f"{p}.conv2.weight"]), padding=1),
                    st, f"{p}.bn2", 1e-5)
            if f"{p}.downsample.0.weight" in st:
                r = _bn(F.conv2d(y, _t(st[f"{p}.downsample.0.weight"]),
                                 stride=s), st, f"{p}.downsample.1", 1e-5)
            y = torch.relu(h + r)
    return y.mean(dim=(2, 3))


def _roundtrip(name, st, tmp_path, image_size):
    npz = tmp_path / "w.npz"
    np.savez(npz, **flatten(convert(name, st)))
    model = build_model(name, 4, compute_dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), image_size)
    merged, loaded, missing = load_pretrained(variables, str(npz))
    non_head = [m for m in missing if "head" not in m and "dropout" not in m]
    assert not non_head, f"backbone keys unmatched: {non_head[:8]}"
    return model, merged, loaded


def test_effb0_convert_load_and_forward_agreement(tmp_path, rng):
    st = fake_lukemelas_b0_state(rng)
    model, merged, loaded = _roundtrip("efficient_b0", st, tmp_path, 64)
    assert loaded > 200
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    feat, _ = model.apply(merged, jnp.asarray(x), train=False)
    with torch.no_grad():
        ref = torch_effb0_forward(st, _t(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(feat), ref, atol=2e-3, rtol=2e-3)


def test_resnet18_convert_load_and_forward_agreement(tmp_path, rng):
    st = {k: v * 0.1 if v.ndim == 4 else v
          for k, v in fake_torch_resnet18_state(rng).items()}
    model, merged, _ = _roundtrip("resnet18", st, tmp_path, 64)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    feat, _ = model.apply(merged, jnp.asarray(x), train=False)
    with torch.no_grad():
        ref = torch_resnet18_forward(st, _t(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(feat), ref, atol=2e-3, rtol=2e-3)


def test_senet154_converter_covers_all_backbone_keys(tmp_path, rng):
    """Schema-level check: converting a fabricated pretrainedmodels-named
    senet154 state_dict loads every backbone leaf (forward agreement for
    this topology is covered by tests/test_senet154.py)."""
    from test_senet154 import TorchSENet154

    tm = TorchSENet154(num_classes=5)
    st = {}
    for name, p in list(tm.named_parameters()) + list(tm.named_buffers()):
        if name.endswith("num_batches_tracked"):
            continue
        # replica names -> pretrainedmodels names
        n = name
        n = n.replace("stem_conv", "layer0.conv").replace("stem_bn", "layer0.bn")
        for li in range(1, 5):
            n = n.replace(f"layer{li}_", f"layer{li}.")
        n = n.replace("downsample_conv", "downsample.0")
        n = n.replace("downsample_bn", "downsample.1")
        n = n.replace("head_fc", "last_linear")
        st[n] = p.detach().numpy()
    _roundtrip("senet154", st, tmp_path, 64)


# ---- VGG11 ----

_VGG11_CFG = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M")


def fake_torchvision_vgg11_state(rng):
    st = {}
    seq, cin = 0, 3
    for v in _VGG11_CFG:
        if v == "M":
            seq += 1
            continue
        st[f"features.{seq}.weight"] = (
            (rng.rand(v, cin, 3, 3).astype(np.float32) - 0.5) * 0.05)
        st[f"features.{seq}.bias"] = (
            (rng.rand(v).astype(np.float32) - 0.5) * 0.05)
        seq += 2
        cin = v
    st["classifier.0.weight"] = (
        (rng.rand(4096, 512 * 7 * 7).astype(np.float32) - 0.5) * 0.01)
    st["classifier.0.bias"] = (rng.rand(4096).astype(np.float32) - 0.5) * 0.01
    st["classifier.3.weight"] = (
        (rng.rand(4096, 4096).astype(np.float32) - 0.5) * 0.01)
    st["classifier.3.bias"] = (rng.rand(4096).astype(np.float32) - 0.5) * 0.01
    st["classifier.6.weight"] = rng.rand(1000, 4096).astype(np.float32)
    st["classifier.6.bias"] = rng.rand(1000).astype(np.float32)
    return st


def torch_vgg11_forward(st, x_nchw):
    y = x_nchw
    seq = 0
    for v in _VGG11_CFG:
        if v == "M":
            y = F.max_pool2d(y, 2, 2)
            seq += 1
        else:
            y = torch.relu(F.conv2d(y, _t(st[f"features.{seq}.weight"]),
                                    _t(st[f"features.{seq}.bias"]), padding=1))
            seq += 2
    y = torch.flatten(y, 1)
    y = torch.relu(F.linear(y, _t(st["classifier.0.weight"]),
                            _t(st["classifier.0.bias"])))
    y = torch.relu(F.linear(y, _t(st["classifier.3.weight"]),
                            _t(st["classifier.3.bias"])))
    return y


def test_vgg11_convert_load_and_forward_agreement(tmp_path, rng):
    st = fake_torchvision_vgg11_state(rng)
    model, merged, _ = _roundtrip("vgg11", st, tmp_path, 224)
    x = rng.rand(1, 224, 224, 3).astype(np.float32)
    feat, _ = model.apply(merged, jnp.asarray(x), train=False)
    with torch.no_grad():
        ref = torch_vgg11_forward(st, _t(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(feat), ref, atol=2e-3, rtol=2e-3)


# ---- DenseNet121 ----

_D121_BLOCKS = (6, 12, 24, 16)


def fake_torchvision_densenet121_state(rng):
    st = {}

    def w(key, *shape):
        st[key] = (rng.rand(*shape).astype(np.float32) - 0.5) * 0.1

    def bn(prefix, ch):
        st[f"{prefix}.weight"] = rng.rand(ch).astype(np.float32) + 0.5
        st[f"{prefix}.bias"] = (rng.rand(ch).astype(np.float32) - 0.5) * 0.1
        st[f"{prefix}.running_mean"] = (rng.rand(ch).astype(np.float32) - 0.5) * 0.1
        st[f"{prefix}.running_var"] = rng.rand(ch).astype(np.float32) + 0.5

    w("features.conv0.weight", 64, 3, 7, 7)
    bn("features.norm0", 64)
    ch = 64
    for bi, n_layers in enumerate(_D121_BLOCKS):
        for li in range(n_layers):
            p = f"features.denseblock{bi + 1}.denselayer{li + 1}"
            bn(f"{p}.norm1", ch)
            w(f"{p}.conv1.weight", 128, ch, 1, 1)
            bn(f"{p}.norm2", 128)
            w(f"{p}.conv2.weight", 32, 128, 3, 3)
            ch += 32
        if bi != len(_D121_BLOCKS) - 1:
            p = f"features.transition{bi + 1}"
            bn(f"{p}.norm", ch)
            w(f"{p}.conv.weight", ch // 2, ch, 1, 1)
            ch //= 2
    bn("features.norm5", ch)
    w("classifier.weight", 1000, ch)
    w("classifier.bias", 1000)
    return st


def torch_densenet121_forward(st, x_nchw):
    y = F.conv2d(x_nchw, _t(st["features.conv0.weight"]), stride=2, padding=3)
    y = torch.relu(_bn(y, st, "features.norm0", 1e-5))
    y = F.max_pool2d(y, 3, stride=2, padding=1)
    for bi, n_layers in enumerate(_D121_BLOCKS):
        for li in range(n_layers):
            p = f"features.denseblock{bi + 1}.denselayer{li + 1}"
            h = torch.relu(_bn(y, st, f"{p}.norm1", 1e-5))
            h = F.conv2d(h, _t(st[f"{p}.conv1.weight"]))
            h = torch.relu(_bn(h, st, f"{p}.norm2", 1e-5))
            h = F.conv2d(h, _t(st[f"{p}.conv2.weight"]), padding=1)
            y = torch.cat([y, h], dim=1)
        if bi != len(_D121_BLOCKS) - 1:
            p = f"features.transition{bi + 1}"
            y = torch.relu(_bn(y, st, f"{p}.norm", 1e-5))
            y = F.conv2d(y, _t(st[f"{p}.conv.weight"]))
            y = F.avg_pool2d(y, 2, 2)
    y = torch.relu(_bn(y, st, "features.norm5", 1e-5))
    return y.mean(dim=(2, 3))


def test_densenet121_convert_load_and_forward_agreement(tmp_path, rng):
    st = fake_torchvision_densenet121_state(rng)
    model, merged, _ = _roundtrip("dense121", st, tmp_path, 64)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    feat, _ = model.apply(merged, jnp.asarray(x), train=False)
    with torch.no_grad():
        ref = torch_densenet121_forward(st, _t(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(feat), ref, atol=2e-3, rtol=2e-3)
