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


# ----------------------------------------------------------------------
# Diagnostics (reference preprocess/ one-off scripts)
# ----------------------------------------------------------------------

def channel_stats(packed_dir: str, chunk: int = 256):
    """Per-channel mean/std of a packed train shard, computed as the mean
    of per-image means and the mean of per-image stds — exactly the
    reference's estimator (preprocess/count_mean_dev.py:7-26), streamed in
    chunks so full-scale shards never load whole."""
    images = np.load(os.path.join(packed_dir, "images.npy"), mmap_mode="r")
    n = len(images)
    mean = np.zeros(3, np.float64)
    std = np.zeros(3, np.float64)
    for s in range(0, n, chunk):
        x = np.asarray(images[s : s + chunk], np.float64) / 255.0
        mean += x.mean(axis=(1, 2)).sum(0)
        # reference uses torch's default unbiased per-image std
        std += x.std(axis=(1, 2), ddof=1).sum(0)
    return (mean / n).tolist(), (std / n).tolist()


def patient_prevalence(onehot_csv: str, patient_from_image=None):
    """Patient-wise disease prevalence: OR the labels of all images of a
    patient, then average over patients (reference:
    preprocess/count_pwise_disease.py:10-30; patient id = image-name prefix
    before '_')."""
    import pandas as pd

    df = pd.read_csv(onehot_csv)
    key = patient_from_image or (lambda s: str(s).split("_")[0])
    df["_patient"] = df["image"].map(key)
    label_cols = [c for c in df.columns if c not in ("image", "_patient")]
    per_patient = df.groupby("_patient")[label_cols].max()
    return per_patient.mean(axis=0)


def filter_present(csv_path: str, image_dir: str, out_csv: str,
                   image_col: str = "image") -> int:
    """Keep only rows whose image file exists under ``image_dir``
    (reference: preprocess/count.py:17-27 filtered_data writer)."""
    import pandas as pd

    present = set()
    for _root, _dirs, files in os.walk(image_dir):
        present.update(files)
    df = pd.read_csv(csv_path)
    kept = df[df[image_col].isin(present)]
    kept.to_csv(out_csv, index=False)
    return len(kept)


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="dataset", required=True)
    for name in ("chestxray14", "ich", "generic"):
        sp = sub.add_parser(name)
        sp.add_argument("--csv", required=True)
        sp.add_argument("--images", required=True)
        sp.add_argument("--out", required=True)
        sp.add_argument("--classes", default=None, help="comma list (generic)")
        sp.add_argument("--image_size", type=int, default=224)
        sp.add_argument("--test_frac", type=float, default=0.3)
        sp.add_argument("--seed", type=int, default=1037)
        sp.add_argument("--limit", type=int, default=None)
    sp = sub.add_parser("stats", help="channel mean/std of a packed shard")
    sp.add_argument("--packed", required=True)
    sp = sub.add_parser("prevalence", help="patient-wise disease prevalence")
    sp.add_argument("--csv", required=True)
    sp = sub.add_parser("filter", help="drop rows whose image file is absent")
    sp.add_argument("--csv", required=True)
    sp.add_argument("--images", required=True)
    sp.add_argument("--out_csv", required=True)
    a = p.parse_args(argv)

    if a.dataset == "stats":
        mean, std = channel_stats(a.packed)
        print(f"mean: {mean}\nstd: {std}")
        return
    if a.dataset == "prevalence":
        print(patient_prevalence(a.csv).to_string())
        return
    if a.dataset == "filter":
        n = filter_present(a.csv, a.images, a.out_csv)
        print(f"kept {n} rows -> {a.out_csv}")
        return

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
