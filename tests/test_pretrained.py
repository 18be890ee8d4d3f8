"""torch→flax weight conversion round-trip on a tiny fabricated resnet18
state_dict (no torchvision download needed)."""

import numpy as np
import pytest

import jax

from fedmlp_tpu.models import build_model
from fedmlp_tpu.models.factory import init_model, load_pretrained

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_torch_weights import _STAGES, convert_resnet, flatten  # noqa: E402


def fake_torch_resnet18_state(rng):
    """Minimal torchvision-named resnet18 state_dict with random floats."""
    st = {}

    def bn(prefix, ch):
        st[f"{prefix}.weight"] = rng.rand(ch).astype(np.float32)
        st[f"{prefix}.bias"] = rng.rand(ch).astype(np.float32)
        st[f"{prefix}.running_mean"] = rng.rand(ch).astype(np.float32)
        st[f"{prefix}.running_var"] = rng.rand(ch).astype(np.float32) + 0.5

    st["conv1.weight"] = rng.rand(64, 3, 7, 7).astype(np.float32)
    bn("bn1", 64)
    chans = [64, 128, 256, 512]
    for li, blocks in enumerate([2, 2, 2, 2]):
        cin = 64 if li == 0 else chans[li - 1]
        cout = chans[li]
        for bi in range(blocks):
            p = f"layer{li + 1}.{bi}"
            c_in = cin if bi == 0 else cout
            st[f"{p}.conv1.weight"] = rng.rand(cout, c_in, 3, 3).astype(np.float32)
            bn(f"{p}.bn1", cout)
            st[f"{p}.conv2.weight"] = rng.rand(cout, cout, 3, 3).astype(np.float32)
            bn(f"{p}.bn2", cout)
            if bi == 0 and li > 0:
                st[f"{p}.downsample.0.weight"] = rng.rand(cout, cin, 1, 1).astype(
                    np.float32
                )
                bn(f"{p}.downsample.1", cout)
    return st


def test_convert_and_load(tmp_path, rng):
    st = fake_torch_resnet18_state(rng)
    tree = convert_resnet(st, _STAGES["resnet18"])
    npz = tmp_path / "w.npz"
    np.savez(npz, **flatten(tree))

    import jax.numpy as jnp

    model = build_model("resnet18", 4, compute_dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), 32)
    merged, loaded, missing = load_pretrained(variables, str(npz))
    # every backbone conv/bn weight must load; only the head stays fresh
    assert loaded >= 100
    head_missing = [m for m in missing if "head" in m]
    non_head_missing = [m for m in missing if "head" not in m]
    assert head_missing, "head must stay freshly initialized"
    assert not non_head_missing, f"backbone keys unmatched: {non_head_missing[:8]}"
    # stem kernel round-trips exactly (OIHW → HWIO)
    got = np.asarray(merged["params"]["stem_conv"]["kernel"])
    want = np.transpose(st["conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # forward still runs
    (f, l), _ = model.apply(merged, jnp.ones((1, 32, 32, 3)), train=True,
                            mutable=["batch_stats"])
    assert np.isfinite(np.asarray(l)).all()
