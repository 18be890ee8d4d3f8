"""bench.py must emit one valid JSON line on any backend (the driver parses
it; VERDICT r1 robustness item). Both the flagship fedmlp mode (the
default) and the fedavg proxy mode are exercised on tiny shapes."""

import json
import os
import subprocess
import sys

import pytest


def _run_bench(algo: str):
    repo = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize: skip TPU register
    env["JAX_PLATFORMS"] = "cpu"
    env.update(BENCH_ALGO=algo, BENCH_MODEL="smallcnn", BENCH_BATCH="8",
               BENCH_CLIENTS="2", BENCH_IMAGE="32", BENCH_ROUNDS="2",
               BENCH_TRAIN_N="64")
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=repo, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = proc.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "train_images_per_sec_per_chip"
    assert rec["unit"] == "img/s"
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0
    return rec


def test_bench_fedmlp_emits_valid_json():
    rec = _run_bench("fedmlp")
    assert rec["config"]["algo"] == "fedmlp"
    assert rec["ips_stage1"] > 0 and rec["ips_stage2"] > 0


@pytest.mark.slow
def test_bench_fedavg_emits_valid_json():
    rec = _run_bench("fedavg")
    assert rec["config"]["algo"] == "fedavg"
    assert len(rec["round_times_s"]) == 2
    assert rec["ips_pipelined"] > 0 and rec["ips_synced"] > 0
