"""Model factory.

Name → Flax module, covering the full reference zoo
(reference: model/all_models.py:29-96). Names are case-insensitive and the
reference spellings ('Resnet18', 'Efficient_b0', 'Dense121', 'SENet50',
'Vgg11') are accepted alongside canonical ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fedmlp_tpu.models import (densenet, efficientnet, resnet, senet,
                               smallcnn, vgg)

MODEL_REGISTRY = {
    # test/debug backbone (not in the reference zoo)
    "smallcnn": (smallcnn.smallcnn, smallcnn.FEATURE_DIM),
    # resnets (feature dims: 512, 512, 2048, 2048, 2048)
    "resnet18": (resnet.resnet18, 512),
    "resnet34": (resnet.resnet34, 512),
    "resnet50": (resnet.resnet50, 2048),
    "resnet101": (resnet.resnet101, 2048),
    "resnet152": (resnet.resnet152, 2048),
    # se variants
    "senet50": (resnet.se_resnet50, 2048),
    "senet101": (resnet.se_resnet101, 2048),
    "senet152": (resnet.se_resnet152, 2048),
    "senet154": (senet.senet154, 2048),
    # efficientnets
    "efficient_b0": (efficientnet.efficientnet_b0, 1280),
    "efficient_b1": (efficientnet.efficientnet_b1, 1280),
    "efficient_b2": (efficientnet.efficientnet_b2, 1408),
    "efficient_b3": (efficientnet.efficientnet_b3, 1536),
    "efficient_b4": (efficientnet.efficientnet_b4, 1792),
    "efficient_b5": (efficientnet.efficientnet_b5, 2048),
    "efficient_b6": (efficientnet.efficientnet_b6, 2304),
    "efficient_b7": (efficientnet.efficientnet_b7, 2560),
    # vggs (penultimate fc is 4096-wide)
    "vgg11": (vgg.vgg11, 4096),
    "vgg13": (vgg.vgg13, 4096),
    "vgg16": (vgg.vgg16, 4096),
    "vgg19": (vgg.vgg19, 4096),
    # densenets
    "dense121": (densenet.densenet121, 1024),
    "dense161": (densenet.densenet161, 2208),
    "dense169": (densenet.densenet169, 1664),
    "dense201": (densenet.densenet201, 1920),
}

_ALIASES = {
    "efficientnet_b" + str(i): "efficient_b" + str(i) for i in range(8)
}
_ALIASES.update({"densenet" + s: "dense" + s for s in ("121", "161", "169", "201")})
_ALIASES.update({"se_resnet50": "senet50", "se_resnet101": "senet101",
                 "se_resnet152": "senet152"})


def _canon(name: str) -> str:
    n = name.lower()
    return _ALIASES.get(n, n)


def feature_dim_of(name: str) -> int:
    return MODEL_REGISTRY[_canon(name)][1]


def build_model(
    name: str,
    num_classes: int,
    compute_dtype=jnp.bfloat16,
    normed_head: bool = False,
    dw_backend: str | None = None,
    remat: bool = False,
    remat_stages: tuple = (),
):
    """Return the Flax module for ``name`` with an ``num_classes``-way head
    (reference: model/build_model.py:5-9 = get_model + modify_last_layer).

    ``dw_backend`` selects the depthwise-conv implementation for the
    EfficientNet family (see MBConv.dw_backend); ignored for other
    architectures. ``remat`` rematerializes backbone blocks in the
    backward pass (EfficientNet + ResNet/SE-ResNet families; see
    EfficientNet.remat / ResNet.remat)."""
    key = _canon(name)
    if key not in MODEL_REGISTRY:
        raise ValueError(f"Name of model unknown {name}")
    ctor, _ = MODEL_REGISTRY[key]
    kw = {}
    if dw_backend and key.startswith("efficient_b"):
        kw["dw_backend"] = dw_backend
    if remat and (key.startswith("efficient_b") or key.startswith("resnet")
                  or key in ("senet50", "senet101", "senet152")):
        kw["remat"] = True
    if remat_stages and key.startswith("efficient_b"):
        kw["remat_stages"] = tuple(remat_stages)
    return ctor(num_classes, dtype=compute_dtype, normed_head=normed_head,
                **kw)


def init_model(model, rng, image_size: int, channels: int = 3, batch: int = 1):
    """Initialize variables with a dummy batch; returns the variables dict
    ({'params': ..., 'batch_stats': ...}).

    Init runs jitted ON THE HOST CPU backend and transfers once: an eager
    init over a remote TPU tunnel is one RPC per op (minutes), and even a
    jitted init pays a large-model compile on the remote compiler; the CPU
    compile is local and the weights are tiny."""
    dummy = jnp.zeros((batch, image_size, image_size, channels), jnp.float32)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    default = jax.devices()[0]
    if cpu is None or default.platform == "cpu":
        return jax.jit(lambda r, d: model.init(r, d, train=False))(rng, dummy)
    with jax.default_device(cpu):
        variables = jax.jit(lambda r, d: model.init(r, d, train=False))(
            rng, dummy
        )
        variables = jax.block_until_ready(variables)
    return jax.device_put(variables, default)


def count_params(variables) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))


def load_pretrained(variables, npz_path: str):
    """Merge converted backbone weights (tools/convert_torch_weights.py
    output) into freshly initialized variables. The classifier head keeps
    its fresh init — the reference re-initializes it via head surgery
    (model/all_models.py:99-130). Keys are '<collection>/<path...>/name'."""
    import numpy as np

    flat = dict(np.load(npz_path))
    missing, loaded = [], 0

    def walk(tree, prefix):
        nonlocal loaded
        out = {}
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out[k] = walk(v, path)
            elif path in flat:
                src = flat[path]
                if src.shape != v.shape:
                    missing.append(path)
                    out[k] = v
                else:
                    out[k] = jnp.asarray(src, v.dtype)
                    loaded += 1
            else:
                missing.append(path)
                out[k] = v
        return out

    new_vars = {
        coll: walk(tree, coll) for coll, tree in variables.items()
    }
    return new_vars, loaded, missing
