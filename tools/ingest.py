#!/usr/bin/env python
"""Offline dataset ingest: CSV label tables + PNG dirs → packed shards.

Covers the reference's preprocess/ pipeline end to end:
  * RSNA ICH: stage-2 CSV → per-image 5-label one-hot (reference:
    preprocess/ICH_process.py:9-46) → 70/30 split (split_train_test.py:
    15-24) → packed uint8 arrays.
  * ChestXray14: Data_Entry CSV → PA-view filter + 8-class one-hot table
    (reference: preprocess/label_rectify.py:8-35) → packed arrays.
  * Generic: any CSV with an image column + one-hot class columns.

Usage:
  python tools/ingest.py chestxray14 --csv Data_Entry_2017.csv \
      --images /data/images --out packed/cxr14
  python tools/ingest.py ich --csv stage_2_train.csv \
      --images /data/ich_png --out packed/ich
  python tools/ingest.py generic --csv labels.csv --images imgs/ \
      --classes a,b,c --out packed/custom
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fedmlp_tpu.data.datasets import (  # noqa: E402
    CHESTXRAY14_CLASSES,
    ICH_CLASSES,
    load_csv_png_dataset,
    save_packed_dataset,
)


def rectify_chestxray14(csv_path: str, out_csv: str) -> str:
    """Data_Entry_2017 CSV → PA-view one-hot 8-class table
    (reference: preprocess/label_rectify.py:8-35)."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    df = df[df["View Position"] == "PA"]
    rows = []
    for _, r in df.iterrows():
        labels = set(str(r["Finding Labels"]).split("|"))
        onehot = {c: int(c in labels) for c in CHESTXRAY14_CLASSES}
        if sum(onehot.values()) == 0 and "No Finding" not in labels:
            continue  # finding outside the 8 kept classes only
        rows.append({"image": r["Image Index"], **onehot})
    out = pd.DataFrame(rows)
    out.to_csv(out_csv, index=False)
    return out_csv


def process_ich(csv_path: str, out_csv: str) -> str:
    """RSNA stage-2 CSV (ID_<img>_<subtype>, Label) → per-image one-hot
    (reference: preprocess/ICH_process.py:9-46). Drops the 'any' row."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    df[["id", "img", "subtype"]] = df["ID"].str.split("_", expand=True)
    df["image"] = "ID_" + df["img"] + ".png"
    piv = df.pivot_table(index="image", columns="subtype", values="Label")
    piv = piv.drop(columns=["any"], errors="ignore").reset_index()
    piv = piv[["image", *ICH_CLASSES]]
    piv.to_csv(out_csv, index=False)
    return out_csv


def split_train_test(csv_path: str, out_dir: str, test_frac: float = 0.3,
                     seed: int = 1037):
    """70/30 split (reference: preprocess/split_train_test.py:15-24)."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    rng = np.random.RandomState(seed)
    perm = rng.permutation(len(df))
    n_test = int(test_frac * len(df))
    test = df.iloc[perm[:n_test]]
    train = df.iloc[perm[n_test:]]
    os.makedirs(out_dir, exist_ok=True)
    train_csv = os.path.join(out_dir, "train.csv")
    test_csv = os.path.join(out_dir, "test.csv")
    train.to_csv(train_csv, index=False)
    test.to_csv(test_csv, index=False)
    return train_csv, test_csv


def pack(csv_path, image_dir, class_names, out_dir, image_size, limit, name):
    ds = load_csv_png_dataset(
        csv_path, image_dir, tuple(class_names), image_size=image_size,
        limit=limit, name=name,
    )
    save_packed_dataset(ds, out_dir)
    print(f"packed {len(ds)} images -> {out_dir}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset", choices=["chestxray14", "ich", "generic"])
    p.add_argument("--csv", required=True)
    p.add_argument("--images", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--classes", default=None, help="comma list (generic)")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--test_frac", type=float, default=0.3)
    p.add_argument("--seed", type=int, default=1037)
    p.add_argument("--limit", type=int, default=None)
    a = p.parse_args()

    os.makedirs(a.out, exist_ok=True)
    if a.dataset == "chestxray14":
        table = rectify_chestxray14(a.csv, os.path.join(a.out, "onehot.csv"))
        classes = CHESTXRAY14_CLASSES
    elif a.dataset == "ich":
        table = process_ich(a.csv, os.path.join(a.out, "onehot.csv"))
        classes = ICH_CLASSES
    else:
        table = a.csv
        classes = tuple(a.classes.split(","))

    tr_csv, te_csv = split_train_test(table, a.out, a.test_frac, a.seed)
    pack(tr_csv, a.images, classes, os.path.join(a.out, "train"),
         a.image_size, a.limit, f"{a.dataset}_train")
    pack(te_csv, a.images, classes, os.path.join(a.out, "test"),
         a.image_size, a.limit, f"{a.dataset}_test")


if __name__ == "__main__":
    main()
