#!/usr/bin/env python
"""Generate a CXR-scale synthetic packed shard on disk (chunked writes via
np.open_memmap — the images never sit in RAM whole). Used by the full-scale
host-stream dress rehearsal: a dataset shaped like the reference's
ChestXray14 train split (reference: dataset/all_dataset.py:10-49 at ~78k
PA images, 224px) that cannot reasonably live in HBM.

Usage:
  python tools/make_synth_shard.py --out /tmp/cxr_scale --train 50000 \
      --test 10000 --classes 8 --size 224
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fedmlp_tpu.data.datasets import make_synthetic_dataset  # noqa: E402


def write_split(out_dir: str, n: int, n_classes: int, size: int, seed: int,
                chunk: int = 1024) -> None:
    """Chunked sequential writes sized for this box's constraints: ONE
    host core behind a high-syscall-overhead sandbox (100% system time).
    MT19937 byte generation measured 0.9 MB/s and per-page memmap faults
    9 MB/s here, so the pixel pool is a 1 MB true-random block tiled at
    memcpy speed and re-sliced at a varying offset per chunk, and the
    .npy is written with plain buffered file writes (disk does 354 MB/s).
    The loader/engine treat pixel bytes opaquely — only the planted
    class-band signal (channel band set to 255 for positives) carries
    label information."""
    os.makedirs(out_dir, exist_ok=True)
    targets = np.zeros((n, n_classes), np.float32)
    rng = np.random.RandomState(seed)
    class_probs = np.linspace(0.08, 0.4, n_classes)
    band = max(2, size // n_classes)
    img_bytes = size * size * 3
    seedblk = np.frombuffer(rng.bytes(1 << 20), np.uint8)
    reps = (chunk * img_bytes) // (1 << 20) + 3
    pool = np.tile(seedblk, reps)
    path = os.path.join(out_dir, "images.npy")
    with open(path, "wb") as f:
        np.lib.format.write_array_header_1_0(
            f, {"descr": "|u1", "fortran_order": False,
                "shape": (n, size, size, 3)})
        for s in range(0, n, chunk):
            m = min(chunk, n - s)
            off = int(rng.randint(0, (1 << 20) - 1))
            imgs = pool[off : off + m * img_bytes].reshape(
                m, size, size, 3).copy()
            tgt = (rng.rand(m, n_classes) <
                   class_probs[None, :]).astype(np.float32)
            for c in range(n_classes):
                r0 = (c * band) % max(1, size - band)
                imgs[tgt[:, c] == 1, r0 : r0 + band, :, c % 3] = 255
            f.write(imgs.data)  # C-contiguous: zero-copy buffered write
            targets[s : s + m] = tgt
    np.save(os.path.join(out_dir, "targets.npy"), targets)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"class_names": [f"c{i}" for i in range(n_classes)],
                   "name": "synthetic_scale"}, f)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--train", type=int, default=50_000)
    p.add_argument("--test", type=int, default=10_000)
    p.add_argument("--classes", type=int, default=8)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--seed", type=int, default=1037)
    a = p.parse_args()
    write_split(os.path.join(a.out, "train"), a.train, a.classes, a.size, a.seed)
    write_split(os.path.join(a.out, "test"), a.test, a.classes, a.size,
                a.seed + 10_000_000)
    print(f"wrote {a.train}+{a.test} packed images under {a.out}")


if __name__ == "__main__":
    main()
