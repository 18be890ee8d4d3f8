"""Dress rehearsal: the reference's EXACT raw-data schemas → tools/ingest
→ packed shards → CLI training → eval, with no hand-built arrays.

Schemas: ChestXray14 Data_Entry_2017 CSV (positional columns: Image Index
=row[0], Finding Labels=row[1], View Position=row[6]; reference:
preprocess/label_rectify.py:10-34) and RSNA ICH stage-2 CSV
(ID_<img>_<subtype> rows; reference: preprocess/ICH_process.py:9-46)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from fedmlp_tpu.data.datasets import (CHESTXRAY14_CLASSES, ICH_CLASSES,
                                      load_packed_dataset)

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from ingest import main as ingest_main  # noqa: E402


def _write_pngs(img_dir, names, rng, size=32):
    from PIL import Image

    img_dir.mkdir(parents=True, exist_ok=True)
    for n in names:
        arr = rng.randint(0, 255, (size, size, 3)).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / n)


def _fake_data_entry_csv(path, rng, n=48):
    """Data_Entry_2017 schema: full column set, findings as |-joined names."""
    findings_pool = list(CHESTXRAY14_CLASSES) + ["No Finding", "Edema"]
    rows = []
    for i in range(n):
        k = rng.randint(1, 3)
        labels = "|".join(
            sorted(set(rng.choice(findings_pool, k).tolist())))
        rows.append({
            "Image Index": f"{i:08d}_000.png",
            "Finding Labels": labels,
            "Follow-up #": 0,
            "Patient ID": i // 3,
            "Patient Age": 50,
            "Patient Gender": "M",
            "View Position": "PA" if i % 4 else "AP",  # AP rows get dropped
            "OriginalImage[Width": 1024, "Height]": 1024,
            "OriginalImagePixelSpacing[x": 0.14, "y]": 0.14,
        })
    pd.DataFrame(rows).to_csv(path, index=False)
    return [r["Image Index"] for r in rows]


def _fake_rsna_csv(path, rng, n=40):
    rows = []
    for i in range(n):
        img = f"{i:06x}"
        pos = set(rng.choice(len(ICH_CLASSES), rng.randint(0, 3),
                             replace=False).tolist())
        for j, sub in enumerate(ICH_CLASSES):
            rows.append({"ID": f"ID_{img}_{sub}", "Label": int(j in pos)})
        rows.append({"ID": f"ID_{img}_any", "Label": int(bool(pos))})
    pd.DataFrame(rows).to_csv(path, index=False)
    return [f"ID_{i:06x}.png" for i in range(n)]


@pytest.mark.parametrize("dataset", ["chestxray14", "ich"])
def test_ingest_to_training_e2e(tmp_path, rng, dataset):
    import jax

    raw_csv = tmp_path / "raw.csv"
    img_dir = tmp_path / "imgs"
    out = tmp_path / "packed"
    if dataset == "chestxray14":
        names = _fake_data_entry_csv(raw_csv, rng)
        classes, n_clients = CHESTXRAY14_CLASSES, 8
    else:
        names = _fake_rsna_csv(raw_csv, rng)
        classes, n_clients = ICH_CLASSES, 5
    _write_pngs(img_dir, names, rng)

    ingest_main([dataset, "--csv", str(raw_csv), "--images", str(img_dir),
                 "--out", str(out), "--image_size", "32", "--seed", "0"])

    train = load_packed_dataset(str(out / "train"))
    test = load_packed_dataset(str(out / "test"))
    assert train.class_names == classes
    assert train.images.shape[1:] == (32, 32, 3)
    assert len(train) > len(test) > 0

    # train through the CLI exactly as a user would
    from fedmlp_tpu.cli import main as cli_main

    out_dir = tmp_path / "runs"
    cli_main([
        "--exp", "FedAVG", "--dataset", dataset, "--model", "smallcnn",
        "--rounds", "2", "--batch_size", "8", "--base_lr", "1e-3",
        "--n_clients", str(min(n_clients, 4)), "--eval_every", "2",
        "--checkpoint_every", "2", "--compute_dtype", "float32",
        "--data_root", str(out), "--image_size", "32",
        "--output_dir", str(out_dir), "--exp_tag", f"e2e_{dataset}",
    ])
    run_dir = out_dir / f"e2e_{dataset}"
    metrics = (run_dir / "logs" / "metrics.jsonl").read_text().strip()
    recs = [json.loads(l) for l in metrics.splitlines()]
    assert any("auc" in r.get("name", "") or "auc" in str(r) for r in recs)
    assert list((run_dir / "models").glob("ckpt_*.pkl"))
