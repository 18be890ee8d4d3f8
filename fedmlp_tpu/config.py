"""Typed configuration for fedmlp_tpu.

Mirrors every flag of the reference CLI (reference: utils/options.py:4-81)
as a frozen dataclass, plus per-dataset presets that in the reference are
applied by mutating ``args`` inside ``get_dataset`` (reference:
dataset/dataset.py:14-17,88-91).

Release-state quirks of the reference are normalized here behind explicit
flags (see SURVEY.md §0):
  * ``stage2_distill`` — the stage-2 global-distillation term is computed but
    commented out in the released code (reference: utils/local_training.py:
    1184-1188). Default False = released behavior; True = paper behavior.
  * experiment-name skew ('FeMLP' vs 'FedMLP') is normalized: this framework
    accepts only canonical algorithm names.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

ALGORITHMS = (
    "fedavg",
    "fedmlp",
    "fednoro",
    "cbafed",
    "fixmatch",  # reference name: 'FedAVG+FixMatch'
    "fedlsr",
    "rscfed",
    "fedirm",
    "rofl",
    "centralized",  # single-client sanity config (BASELINE configs[0])
)

# Canonical ImageNet normalization used by every reference transform
# (reference: dataset/dataset.py:21-22).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class DataConfig:
    """Dataset geometry + pipeline knobs."""

    name: str = "ChestXray14"  # ChestXray14 | ICH | synthetic
    image_size: int = 224  # reference: dataset/dataset.py:25 Resize((224,224))
    channels: int = 3
    n_classes: int = 8
    # Packed-array roots (replaces the reference's hard-coded author paths,
    # reference: dataset/dataset.py:13,87).
    root: Optional[str] = None
    # synthetic dataset controls (test/bench fixture)
    synthetic_train_size: int = 512
    synthetic_test_size: int = 128
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD
    # weak-view warp backend: 'auto' (fused on TPU, gather elsewhere),
    # 'gather' (single-pass bilinear, XLA gathers), 'paeth' (3-shear
    # take_along_axis), 'pallas' (v1 3-shear roll kernel), 'fused'
    # (v3 single-kernel block-parallel warp — won its round-3 A/B +6.9%
    # over v1 on the flagship), 'normonly' (diagnostic, no warp). On TPU
    # the gather warp dominates the round program (~5x throughput
    # difference).
    augment_backend: str = "auto"
    # stream image batches from the packed .npy on disk via the native
    # threaded loader instead of keeping the dataset resident in HBM
    # (for datasets larger than device memory)
    host_stream: bool = False
    # host_stream window: local steps per streamed window. 0 gathers the
    # WHOLE round's batches to HBM up front (fine when round ⊂ HBM); W>0
    # holds only W·K·B images on device at a time, the native loader
    # prefetching window w+1 while window w trains (for rounds larger
    # than HBM — ICH scale is 185k images ≈ 27 GB/round, reference
    # preprocess/ICH_process.py:45-46). Engine support: lockstep rounds
    # (the flagship path); other engines fall back to full gather.
    stream_window: int = 0


@dataclass(frozen=True)
class FedMLPConfig:
    """FedMLP-specific hyperparameters (reference: utils/options.py:46-49,59-64)."""

    rounds_stage1: int = 50
    U: float = 0.7  # tao upper bound
    L: float = 0.3  # tao lower bound
    clean_threshold: float = 0.005
    noise_threshold: float = 0.01
    # τ-scaled tag selection: the variant the reference ships commented out
    # (utils/local_training.py:1072-1073); tao_min floors τ. Default 0 =
    # released fixed-threshold behavior.
    difficulty_estimate: int = 0
    tao_min: float = 0.1
    # In-batch mixup for stage-2 (reference DatasetSplit_Mixup +
    # mixup_criterion, utils/local_training.py:1365-1415/827-828 — an
    # ablation path the reference parses (--mixup default 1) but never
    # enables from main.py). Default 0 = released behavior.
    mixup: int = 0
    # Reference-ballast: parsed by utils/options.py:62 but read nowhere in
    # the released reference (the only mention, main.py:225, is commented
    # out). Kept for flag-for-flag CLI parity.
    miss_client_difficulty: int = 1
    # Released code disables the stage-2 distillation term
    # (reference: utils/local_training.py:1187-1188 commented out).
    stage2_distill: bool = False


@dataclass(frozen=True)
class RoFLConfig:
    """RoFL hyperparameters (reference: utils/options.py:52-57)."""

    forget_rate: float = 0.2
    num_gradual: int = 10  # T_k
    T_pl: int = 100
    lambda_cen: float = 1.0
    lambda_e: float = 0.8


@dataclass(frozen=True)
class FedLSRConfig:
    t_w: int = 40  # beta ramp rounds (reference: utils/options.py:67)


@dataclass(frozen=True)
class FedIRMConfig:
    """FedIRM hyperparameters (reference: utils/options.py:69-72)."""

    rounds_sup: int = 20
    consistency: float = 1.0
    consistency_rampup: float = 30.0
    ema_decay: float = 0.99


@dataclass(frozen=True)
class FedNoRoConfig:
    """FedNoRo hyperparameters (reference: utils/options.py:74-77)."""

    rounds_warmup: int = 500
    begin: int = 10
    end: int = 499
    a: float = 0.8


@dataclass(frozen=True)
class CBAFedConfig:
    rounds_warmup: int = 50  # reference: utils/options.py:79


@dataclass(frozen=True)
class MeshConfig:
    """TPU mesh layout. The client axis is the primary parallel dimension
    (the reference trains clients sequentially, reference: main.py:135)."""

    client_axis: int = -1  # -1: use all devices on the client axis
    data_axis: int = 1  # per-client data parallelism


@dataclass(frozen=True)
class Config:
    """Top-level config. Field-for-field superset of the reference CLI
    (reference: utils/options.py:4-81)."""

    # system
    deterministic: int = 1
    seed: int = 1037
    # basic
    algorithm: str = "fedmlp"  # reference --exp
    model: str = "resnet18"  # reference --model Resnet18
    batch_size: int = 32
    feature_dim: int = 512  # penultimate feature width of ResNet18
    base_lr: float = 3e-5  # ICH 3e-5 / ChestXray14 3e-6
    pretrained: int = 0  # ImageNet init if weights present
    # converted backbone weights (tools/convert_torch_weights.py output)
    pretrained_path: Optional[str] = None
    train: int = 1
    # PSL
    annotation_num: int = 1  # classes annotated per client
    # FL
    n_clients: int = 8
    iid: int = 1
    alpha_dirichlet: float = 0.5
    local_ep: int = 1
    rounds_warmup: int = 500  # total federated rounds
    # rounds_corr marks an extra checkpoint milestone (reference:
    # main.py:360 saves the model when rnd+1 == rounds_corr); the reference
    # otherwise uses these three only to name its output directory
    # (utils/utils.py:52-53). Kept for CLI parity; the CLI mirrors the
    # milestone save.
    rounds_corr: int = 200
    rounds_distillation: int = 200
    rounds_finetune: int = 50
    runs: int = 1
    # label hiding: fraction of positives KEPT visible for non-active classes
    # (reference: main.py:63, p_pos_1 = 0. → all positives hidden)
    p_pos: float = 0.0
    # eval cadence (reference: main.py:322 — every 10 rounds)
    eval_every: int = 10
    checkpoint_every: int = 10
    # numerics
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    # engine: unroll factor of the local-step lax.scan (trades compile time
    # and code size for less while-loop bookkeeping + cross-step scheduling)
    scan_unroll: int = 1
    # engine: run dual-view losses as one 2B forward when the algorithm
    # provides a loss_fn_viewcat (FedMLP stage 1). Doubles the student
    # convs' batch — at B=32 XLA lays EfficientNet's small-C activations
    # batch-minor in the 128-lane tile, so 2B halves the padding waste
    # (round-4 HLO analysis). BN batch stats are computed jointly over
    # both views (deviates from the reference's two sequential forwards,
    # utils/local_training.py:937-947; correctness covered by
    # tests/test_fedmlp.py::test_view_concat_stage1_trains). Measured
    # +14% on the flagship stage-1 round in two independent interleaved
    # A/Bs (round 4; round 3's neutral verdict predated the warp-v3
    # bottleneck shift) — 'auto' = on for TPU, off elsewhere.
    view_concat: str = "auto"
    # engine: when the viewcat loss is active (lockstep engine), hoist the
    # 2B view concat out of the per-client lax.map — one step-level concat
    # at [Kl, 2B, ...] instead of K in-map slice+concat chains, each of
    # which lowered to a 38.5 MB layout-conversion copy in the round-4
    # stage-1 trace. Bitwise-identical math (same concat order,
    # tests/test_lockstep_round.py::test_view_precat_bitwise). Measured
    # NEUTRAL on the flagship (round-4 tail A/B: precat_off 1.0074 vs
    # drift 1.0036 — the conversion moves to the step-level concat rather
    # than disappearing); 'auto' = off, kept as a tested knob.
    view_precat: str = "auto"
    # engine: unroll the lockstep engine's per-step lax.map over clients
    # into a Python loop of static-index slices — removes the map's
    # dynamic-slice/update machinery at a K×-larger step program
    # (compile-time experiment knob; A/B'd in BENCH_NOTES round 4)
    client_unroll: int = 0
    # engine: pack every f32 leaf of the lockstep map's per-client output
    # (grads + updated batch stats) with <= N elements into ONE flat
    # vector inside the map and unpack via slices outside — collapses the
    # ~250 tiny per-client stacked outputs (BN scale/bias grads + running
    # stats, f32[16..1280]) whose dynamic-update-slice copies pay pure DMA
    # latency 20x/step (round-4 trace: ~15.6 ms/step of copy-done in nine
    # tiny buffers). Bit-identical math (reshape/concat/slice only,
    # tests/test_lockstep_round.py::test_small_pack_bitwise). 0 = off.
    small_pack: int = 0
    # engine: rematerialize backbone blocks in the backward pass
    # (EfficientNet/ResNet/SENet families) — saves only block inputs as
    # residuals and recomputes the internals during the gradient.
    # Measured NEUTRAL on the flagship round (1.0009x, BENCH_NOTES
    # attack 4): recompute FLOPs are free but bytes are unchanged at
    # 224px activation sizes. Value is MEMORY headroom, not speed.
    remat: int = 0
    # engine: selective remat — comma list of EfficientNet STAGE indices
    # (0-6 for b0) to rematerialize when ``remat`` is off, e.g. "0,1"
    # recomputes only the byte-fat 112/56 px early stages whose backward
    # reads carry the lane-padding inflation (BENCH_NOTES round-4 HLO
    # study). Ignored for non-EfficientNet models.
    remat_stages: str = ""
    # engine: depthwise-conv implementation for the EfficientNet family —
    # '' (= 'conv', the measured-best default: all three replacements
    # lost the round-4 integrated A/B), 'conv' (XLA grouped conv),
    # 'dense' (diagonal-masked full conv routing the backward through the
    # standard conv emitter; ops/depthwise.py::depthwise_dense,
    # 0.875x AGAINST), 'taps', or
    # 'pallas' (XLA forward + Pallas padded-window backward,
    # ops/dw_pallas.py; per-op parity-to-slower, kept for A/Bs)
    dw_backend: str = ""
    # engine: channel-stacked lockstep clients (models/stacked.py) — 'auto'
    # currently resolves OFF (the mapped lax.map engine measured faster
    # end-to-end: BN rides XLA's conv fusions there, BENCH_NOTES.md) and
    # will only engage once a stacked A/B wins; 'on'/'off' force it
    client_stacking: str = "auto"
    # engine: lockstep loop order (scan over local steps outside, lax.map
    # over clients inside — parallel/fl_runtime.py::
    # make_lockstep_local_round) so the frozen-global forwards of
    # NEEDS_GLOBAL algorithms (FedMLP stage-1 runs two per step, reference
    # utils/local_training.py:943-947) batch across clients at K·B, and
    # augmentation runs as one K·B call per step. 'auto' engages on TPU
    # for NEEDS_GLOBAL algorithms; 'on'/'off' force it.
    batched_global: str = "auto"
    # engine: hoist augmentation out of the local-step scan into one
    # batched warp over all S*K*B round images (when they fit). Measured
    # NEGATIVE on the bench round (2651 avg → 2485 img/s: materializing
    # the f32 views costs more than the in-scan calls save) — default off.
    hoist_augment: int = 0
    # engine (mapped only): compute the round's views OUTSIDE the round
    # program as independent `pre_augment`-image jitted chunks and feed the
    # round pre-augmented dense views (the hoist path's dict form,
    # bitwise-identical — fl_runtime.pre_augment_views). Crash-dodge for
    # the weak+strong TPU-worker fault at scale (K·B >= 640): small
    # standalone augment programs match the never-crashing K=4 scale.
    # -1 auto (engage chunk=256 exactly at the crash config: weak_strong,
    # K·B >= STRONG_SCALE_THRESHOLD, TPU, mapped engine, no mesh, no
    # host_stream) / 0 off / >0 forced chunk size.
    pre_augment: int = -1
    # engine: when compute_dtype is bfloat16, cast the f32 master weights
    # once per step so conv fusions stream bf16 (not f32) weights to VMEM.
    # Measured NEGATIVE on the bench round (2640 → 2388 img/s: the explicit
    # cast materializes and displaces XLA's own scheduling) — default off,
    # kept as a measured knob.
    weight_stream: int = 0
    # sub-configs
    data: DataConfig = field(default_factory=DataConfig)
    fedmlp: FedMLPConfig = field(default_factory=FedMLPConfig)
    rofl: RoFLConfig = field(default_factory=RoFLConfig)
    fedlsr: FedLSRConfig = field(default_factory=FedLSRConfig)
    fedirm: FedIRMConfig = field(default_factory=FedIRMConfig)
    fednoro: FedNoRoConfig = field(default_factory=FedNoRoConfig)
    cbafed: CBAFedConfig = field(default_factory=CBAFedConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    # output
    output_dir: str = "outputs"
    exp_tag: str = ""

    def __post_init__(self):
        if self.algorithm not in ALGORITHMS:
            raise ValueError(
                f"unknown algorithm {self.algorithm!r}; expected one of {ALGORITHMS}"
            )

    # ------------------------------------------------------------------
    @property
    def n_classes(self) -> int:
        return self.data.n_classes

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    # ------------------------------------------------------------------
    @staticmethod
    def preset(dataset: str, **overrides) -> "Config":
        """Per-dataset presets (reference: dataset/dataset.py:14-17,88-91)."""
        dataset_canon = {
            "chestxray14": "ChestXray14",
            "ich": "ICH",
            "synthetic": "synthetic",
        }.get(dataset.lower())
        if dataset_canon is None:
            raise ValueError(f"unknown dataset {dataset!r}")
        if dataset_canon == "ChestXray14":
            data = DataConfig(name="ChestXray14", n_classes=8)
            base = dict(n_clients=8, base_lr=3e-6, data=data)
        elif dataset_canon == "ICH":
            data = DataConfig(name="ICH", n_classes=5)
            base = dict(n_clients=5, base_lr=3e-5, data=data)
        else:  # synthetic
            data = DataConfig(name="synthetic", n_classes=5, image_size=64)
            base = dict(n_clients=5, base_lr=3e-4, data=data)
        base.update(overrides)
        return Config(**base)


def active_class_lists(cfg: Config) -> list[list[int]]:
    """Client i annotates classes [i*k ... i*k+k-1] mod n_classes; with the
    default annotation_num=1 this is [[0],[1],...] exactly as the reference
    wires it (reference: main.py:76, active_class_list=[i])."""
    k = cfg.annotation_num
    C = cfg.n_classes
    return [[(i * k + j) % C for j in range(k)] for i in range(cfg.n_clients)]
