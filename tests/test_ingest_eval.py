"""Offline ingest round-trip + eval extras (class_test, val_loss, t-SNE)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_ingest_generic_roundtrip(tmp_path, rng):
    from PIL import Image

    import pandas as pd

    from fedmlp_tpu.data.datasets import load_packed_dataset
    from ingest import pack, split_train_test

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    for i in range(12):
        fname = f"im{i}.png"
        arr = rng.randint(0, 255, (20, 20, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / fname)
        rows.append({"image": fname, "a": i % 2, "b": (i // 2) % 2})
    csv = tmp_path / "labels.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    tr_csv, te_csv = split_train_test(str(csv), str(tmp_path), 0.25, seed=0)
    pack(tr_csv, str(img_dir), ("a", "b"), str(tmp_path / "train"), 16, None, "t")
    ds = load_packed_dataset(str(tmp_path / "train"))
    assert ds.images.shape == (9, 16, 16, 3)
    assert ds.targets.shape == (9, 2)
    assert ds.class_names == ("a", "b")


def test_ich_pivot(tmp_path):
    import pandas as pd

    from ingest import process_ich

    rows = []
    for img in ("aaa", "bbb"):
        for sub in ("epidural", "intraparenchymal", "intraventricular",
                    "subarachnoid", "subdural", "any"):
            rows.append({"ID": f"ID_{img}_{sub}",
                         "Label": 1 if sub == "subdural" else 0})
    df = pd.DataFrame(rows)
    csv = tmp_path / "stage2.csv"
    df.to_csv(csv, index=False)
    out = process_ich(str(csv), str(tmp_path / "onehot.csv"))
    piv = pd.read_csv(out)
    assert list(piv.columns) == ["image", "epidural", "intraparenchymal",
                                 "intraventricular", "subarachnoid", "subdural"]
    assert (piv["subdural"] == 1).all()
    assert (piv["epidural"] == 0).all()


def test_eval_extras(rng):
    from fedmlp_tpu.config import Config, DataConfig
    from fedmlp_tpu.eval.evaluate import class_test, val_loss
    from fedmlp_tpu.train import Trainer

    cfg = Config(
        algorithm="fedavg", model="smallcnn", batch_size=8, base_lr=1e-3,
        n_clients=2, local_ep=1, rounds_warmup=1, eval_every=100, seed=2,
        data=DataConfig(name="synthetic", n_classes=3, image_size=24,
                        synthetic_train_size=48, synthetic_test_size=24),
        compute_dtype="float32",
    )
    t = Trainer(cfg)
    t.run_round(0)
    r = class_test(t, classid=0)
    assert set(r) == {"BACC", "R", "F1", "P"}
    vl = val_loss(t)
    assert np.isfinite(vl)


def test_tsne_visual(tmp_path, rng):
    from fedmlp_tpu.eval.visual import tsne_visual

    feats = rng.randn(30, 16).astype(np.float32)
    labels = rng.randint(0, 2, 30)
    path = tsne_visual(feats, labels, rnd=1, name="unit", out_dir=str(tmp_path))
    assert os.path.exists(path)


def test_roc_print(tmp_path, rng):
    from fedmlp_tpu.eval.visual import roc_print

    y = (rng.rand(50, 3) < 0.4).astype(float)
    y[0] = 1
    y[1] = 0
    p = rng.rand(50, 3)
    path = roc_print(y, p, out_path=str(tmp_path / "roc.png"))
    assert os.path.exists(path)


def test_channel_stats_matches_reference_estimator(tmp_path, rng):
    """Streamed mean-of-per-image-means / mean-of-per-image-stds
    (reference: preprocess/count_mean_dev.py:7-26)."""
    from ingest import channel_stats

    imgs = rng.randint(0, 256, (7, 8, 8, 3)).astype(np.uint8)
    np.save(tmp_path / "images.npy", imgs)
    mean, std = channel_stats(str(tmp_path), chunk=3)
    x = imgs.astype(np.float64) / 255.0
    np.testing.assert_allclose(mean, x.mean(axis=(1, 2)).mean(0), rtol=1e-12)
    np.testing.assert_allclose(std, x.std(axis=(1, 2), ddof=1).mean(0),
                               rtol=1e-12)


def test_patient_prevalence(tmp_path):
    import pandas as pd

    from ingest import patient_prevalence

    rows = [
        {"image": "p1_000.png", "a": 1, "b": 0},
        {"image": "p1_001.png", "a": 0, "b": 1},  # patient p1: a OR b -> both
        {"image": "p2_000.png", "a": 0, "b": 0},
    ]
    csv = tmp_path / "onehot.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    prev = patient_prevalence(str(csv))
    assert prev["a"] == pytest.approx(0.5)  # 1 of 2 patients
    assert prev["b"] == pytest.approx(0.5)


def test_filter_present(tmp_path, rng):
    import pandas as pd
    from PIL import Image

    from ingest import filter_present

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(rng.randint(0, 255, (4, 4, 3)).astype(np.uint8)).save(
        img_dir / "here.png")
    csv = tmp_path / "all.csv"
    pd.DataFrame([{"image": "here.png", "a": 1},
                  {"image": "gone.png", "a": 0}]).to_csv(csv, index=False)
    out = tmp_path / "kept.csv"
    assert filter_present(str(csv), str(img_dir), str(out)) == 1
    assert pd.read_csv(out)["image"].tolist() == ["here.png"]
