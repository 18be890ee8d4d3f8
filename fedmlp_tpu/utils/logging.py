"""Logging / metric output.

Reference behavior (utils/utils.py:42-76): an output tree
``outputs_<tag>/<exp>/{models,logs}``, Python logging to file+stdout, and a
tensorboardX SummaryWriter. Here: same tree, same logging setup, plus a
JSONL metric stream that is machine-readable (tensorboardX optional — it is
not part of the baked TPU image)."""

from __future__ import annotations

import json
import logging
import os
import random
import sys
import time

import numpy as np


def set_seed(seed: int) -> None:
    """numpy/python seeding (reference: utils/utils.py:12-17; torch/cudnn
    seeding is N/A — JAX RNG is explicit keys)."""
    random.seed(seed)
    np.random.seed(seed)


def set_output_files(output_dir: str, exp_tag: str):
    """Create the output tree and configure logging
    (reference: utils/utils.py:42-76). Returns (MetricWriter, models_dir)."""
    exp_dir = os.path.join(output_dir, exp_tag or "exp")
    models_dir = os.path.join(exp_dir, "models")
    logs_dir = os.path.join(exp_dir, "logs")
    os.makedirs(models_dir, exist_ok=True)
    os.makedirs(logs_dir, exist_ok=True)

    logging.basicConfig(
        filename=os.path.join(logs_dir, "logs.txt"),
        level=logging.INFO,
        format="[%(asctime)s.%(msecs)03d] %(message)s",
        datefmt="%H:%M:%S",
    )
    logging.getLogger().addHandler(logging.StreamHandler(sys.stdout))
    writer = MetricWriter(logs_dir)
    return writer, models_dir


class MetricWriter:
    """JSONL scalar stream + optional tensorboardX passthrough."""

    def __init__(self, logs_dir: str):
        self.path = os.path.join(logs_dir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self._tb = None
        try:  # tensorboardX optional
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(logs_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value, step: int):
        rec = {"tag": tag, "value": float(value), "step": int(step),
               "time": time.time()}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()
