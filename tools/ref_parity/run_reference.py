#!/usr/bin/env python
"""Head-to-head parity: run the PyTorch REFERENCE's own training code
(/root/reference — imported in place, never copied) on the shared fixture.

What runs verbatim from the reference:
  * LocalUpdate.train (FedAVG)         utils/local_training.py:628-703
  * LocalUpdate.train_FedMLP (2-stage) utils/local_training.py:904-1256
  * DatasetSplit label masking         utils/local_training.py:1328-1362
  * FedAvg / FedAvg_tao / FedAvg_proto utils/FedAvg.py:7-14,51-93
  * globaltest 7-metric evaluation     utils/evaluations.py:15-73

What this driver replaces (documented deviations, all §0 release-state
quirks or environment shims — SURVEY.md §0):
  * the round loop of main.py:106-357 (re-expressed below; the FeMLP/
    FedMLP experiment-name skew and the nonexistent train_FeMLP dispatch
    are normalized to the working train_FedMLP path);
  * the model: torchvision is not installed and stock torchvision models
    violate the (feature, logits) contract anyway — a torchvision-named
    ResNet18 twin (torch_resnet18.py) with the contract made explicit;
  * the dataset: hard-coded author CSV/PNG paths (dataset/all_dataset.py)
    → an in-memory fixture yielding the same sample dict schema;
  * CUDA: .cuda()/torch.cuda.FloatTensor patched to CPU no-ops;
  * DataLoader workers forced to 0 (single-core host).

Usage: python tools/ref_parity/run_reference.py
           {FedAVG|FedMLP|FedNoRo|CBAFed|FedAVG+FixMatch} [--seed N]
Writes outputs/ref_parity/reference_<exp>[_sN].jsonl

Round-5 extensions (VERDICT item 6): FedNoRo / CBAFed / FixMatch run
their reference trainers verbatim (utils/local_training.py:115-335,
771-825) inside the warm-phase round loop of main.py:127-289 (CBAFed's
rnd%5 residual mixing included); ``--seed N`` varies ONLY the training
order randomness (torch.manual_seed → DataLoader shuffles) on the fixed
fixture/init so multi-seed runs measure the data-order noise floor the
cross-framework comparison is judged against.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from copy import deepcopy

import numpy as np
import torch

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "..")))
from tools.ref_parity import common as C
from tools.ref_parity.torch_resnet18 import TorchResNet18

# ---------------------------------------------------------------- CUDA shims
torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
torch.cuda.FloatTensor = torch.FloatTensor  # type: ignore[attr-defined]

sys.path.insert(0, "/root/reference")
import utils.local_training as lt  # noqa: E402
import utils.evaluations as ue  # noqa: E402
from utils.FedAvg import FedAvg, FedAvg_proto, FedAvg_tao  # noqa: E402
from utils.FedNoRo import get_current_consistency_weight  # noqa: E402

_TorchLoader = torch.utils.data.DataLoader


def _loader_no_workers(*a, **k):
    k["num_workers"] = 0
    return _TorchLoader(*a, **k)


lt.DataLoader = _loader_no_workers
ue.DataLoader = _loader_no_workers


class FixtureDataset:
    """In-memory stand-in for dataset/all_dataset.py::ICH: yields the same
    {'image'|'image_aug_1'/'image_aug_2', 'target'} dict; augmentation is
    identity (normalize only) per the parity protocol."""

    def __init__(self, images_u8, targets, dual):
        self.images = images_u8
        self.targets = targets  # DatasetSplit.get_num_of_each_class reads it
        self.dual = dual
        m = torch.tensor(C.MEAN).view(3, 1, 1)
        s = torch.tensor(C.STD).view(3, 1, 1)
        self._m, self._s = m, s

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        x = torch.from_numpy(
            self.images[i].astype(np.float32).transpose(2, 0, 1)) / 255.0
        x = (x - self._m) / self._s
        # fresh target tensor per call: DatasetSplit mutates it in place
        t = torch.from_numpy(self.targets[i].copy())
        if self.dual:
            return {"image_aug_1": x, "image_aug_2": x.clone(), "target": t}
        return {"image": x, "target": t}


def make_args(exp):
    ns = argparse.Namespace(
        exp=exp, dataset="fixture", model="Resnet18", batch_size=C.BATCH,
        base_lr=C.BASE_LR, pretrained=0, train=1, annotation_num=1,
        n_classes=C.N_CLASSES, n_clients=C.N_CLIENTS,
        num_users=C.N_CLIENTS, iid=1, local_ep=C.LOCAL_EP,
        rounds_warmup=C.ROUNDS, rounds_FedMLP_stage1=C.STAGE1,
        U=0.7, L=0.3, tao_min=0.1, runs="0", seed=C.SEED,
        feature_dim=512, device=torch.device("cpu"), deterministic=1,
        clean_threshold=0.05, noise_threshold=0.1, input_channel=3,
        distill=1, gpu="", p_pos_1=0.0,
        # FedNoRo warm phase (utils/options.py:74-77 defaults)
        rounds_FedNoRo_warmup=500, begin=10, end=499, a=0.8,
        # CBAFed warm phase (utils/options.py:79 default)
        rounds_CBAFed_warmup=50,
    )
    return ns


EXPS = ("FedAVG", "FedMLP", "FedNoRo", "CBAFed", "FedAVG+FixMatch")


def main():
    exp = sys.argv[1] if len(sys.argv) > 1 else "FedMLP"
    assert exp in EXPS
    seed_off = 0
    if "--seed" in sys.argv:
        seed_off = int(sys.argv[sys.argv.index("--seed") + 1])
    # the fixture, partition and init weights stay pinned to C.SEED; the
    # seed offset varies only the training-order randomness (DataLoader
    # shuffles) — the noise floor of the cross-framework comparison
    torch.manual_seed(C.SEED + seed_off)
    np.random.seed(C.SEED + seed_off)
    import random as _random

    _random.seed(C.SEED + seed_off)
    torch.set_num_threads(1)

    args = make_args(exp)
    tr, te, dict_users, hidden = C.fixture()
    pt, _npz = C.ensure_init()

    dual = exp in ("FedMLP", "FedAVG+FixMatch")
    train_ds = FixtureDataset(tr.images, tr.targets, dual=dual)
    test_ds = FixtureDataset(te.images, te.targets, dual=False)
    test_ds.targets = te.targets  # globaltest reads .targets

    # label hiding (reference main.py:58-66): class_neg_idx[c] = hidden
    # positive indices of class c
    class_neg_idx = [set(np.where(hidden[:, c])[0].tolist())
                     for c in range(C.N_CLASSES)]
    class_pos_idx = [set(np.where(tr.targets[:, c] == 1)[0].tolist())
                     for c in range(C.N_CLASSES)]

    netglob = TorchResNet18(C.N_CLASSES)
    netglob.load_state_dict(torch.load(pt))

    locals_ = []
    for i in range(C.N_CLIENTS):
        train_ds_i = FixtureDataset(tr.images, tr.targets, dual=dual)
        train_ds_i.targets = tr.targets  # get_num_of_each_class reads it
        locals_.append(lt.LocalUpdate(
            args, i, train_ds_i, dict_users[i], class_pos_idx,
            class_neg_idx, active_class_list=[i]))

    dict_len = [len(dict_users[i]) for i in range(C.N_CLIENTS)]
    active_class_list, negetive_class_list = [], []
    class_active_client_list, class_negative_client_list = [], []
    tao = [0] * C.N_CLASSES
    Prototype = []

    records = []
    w_glob_res = None  # CBAFed residual state (main.py:278-288)
    for rnd in range(C.ROUNDS):
        t0 = time.time()
        w_locals, loss_locals, taos, Prototypes = [], [], [], []
        if exp == "FedNoRo":
            # main.py:127-128 — KD ramp weight per round
            weight_kd = get_current_consistency_weight(
                rnd, args.begin, args.end) * args.a
        for i in range(C.N_CLIENTS):
            local = locals_[i]
            if exp == "FedAVG":
                w, loss, *_rest, neg, act = local.train(
                    rnd, net=deepcopy(netglob), writer1=None)
            elif exp == "FedNoRo":
                # warm phase (rnd < rounds_FedNoRo_warmup), main.py:140-145
                w, loss, _1, _2, neg, act = local.train_FedNoRo(
                    i, rnd, net=deepcopy(netglob), writer1=None,
                    weight_kd=weight_kd)
            elif exp == "CBAFed":
                # warm phase, main.py:149-155 (class_num/data_num harvests
                # only matter post-warmup)
                w, loss, _1, _2, neg, act, _cnl, _dn = local.train_CBAFed(
                    rnd, net=deepcopy(netglob))
            elif exp == "FedAVG+FixMatch":
                w, loss, _1, _2, neg, act = local.train_FixMatch(
                    rnd, net=deepcopy(netglob))
            else:
                # reference main.py:180-183 — round 0 passes None for
                # both lists; later rounds index the round-0 harvests
                out = local.train_FedMLP(
                    rnd, tao, Prototype, None,
                    negetive_class_list[i] if rnd > 0 else None,
                    active_class_list[i] if rnd > 0 else None,
                    net=deepcopy(netglob))
                if len(out) == 8:
                    w, loss, _1, _2, neg, act, t_loc, proto_loc = out
                    taos.append(deepcopy(t_loc))
                    Prototypes.append(deepcopy(proto_loc))
                else:
                    w, loss, _1, _2, neg, act = out
            if rnd == 0:
                active_class_list.append(act)
                negetive_class_list.append(neg)
            w_locals.append(deepcopy(w))
            loss_locals.append(float(loss))
        if rnd == 0:
            for c in range(C.N_CLASSES):
                class_active_client_list.append(
                    [j for j in range(C.N_CLIENTS)
                     if c in active_class_list[j]])
                class_negative_client_list.append(
                    [j for j in range(C.N_CLIENTS)
                     if c in negetive_class_list[j]])
        w_glob = FedAvg(w_locals, dict_len)
        if exp == "CBAFed" and rnd % 5 == 0 and rnd > 0:
            # warm-phase residual mixing every 5th round (main.py:278-288)
            for k in w_glob.keys():
                w_glob[k] = 0.2 * w_glob[k] + 0.8 * w_glob_res[k]
        netglob.load_state_dict(deepcopy(w_glob))
        if exp == "CBAFed" and rnd % 5 == 0:
            w_glob_res = deepcopy(w_glob)
        if exp == "FedMLP" and rnd >= C.STAGE1 - 1:
            tao = FedAvg_tao(taos, dict_len, class_negative_client_list)
            Prototype = FedAvg_proto(Prototypes, dict_len,
                                     class_active_client_list)
        rec = {"round": rnd, "losses": loss_locals,
               "seconds": time.time() - t0}
        if (rnd + 1) % C.EVAL_EVERY == 0 or rnd == C.ROUNDS - 1:
            m = ue.globaltest(deepcopy(netglob), test_ds, args)
            rec["metrics"] = {k: float(v) for k, v in m.items()}
            print(f"[ref {exp}] round {rnd}: {rec['metrics']}", flush=True)
        records.append(rec)
        print(f"[ref {exp}] round {rnd} done {rec['seconds']:.1f}s "
              f"loss={np.mean(loss_locals):.4f}", flush=True)

    os.makedirs(C.OUT, exist_ok=True)
    suffix = f"_s{seed_off}" if seed_off else ""
    C.write_jsonl(
        os.path.join(C.OUT, f"reference_{exp}{suffix}.jsonl"), records)


if __name__ == "__main__":
    main()
