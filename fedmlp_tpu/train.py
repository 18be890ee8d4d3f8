"""Round-loop trainer (the reference's main.py, re-designed TPU-first).

One federated round = one jitted SPMD program over the client-stacked state
(see parallel/fl_runtime.py). The trainer owns the host-side pieces: batch
plans, server-side algorithm state that is naturally scalar/small (τ,
prototypes, relation matrices), evaluation cadence, and checkpoints.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fedmlp_tpu import algos as algo_registry
from fedmlp_tpu.config import Config, active_class_lists
from fedmlp_tpu.data.datasets import ArrayDataset, make_synthetic_dataset
from fedmlp_tpu.data.masking import build_hidden_mask, class_client_lists
from fedmlp_tpu.data.partition import iid_sampling, non_iid_dirichlet_sampling
from fedmlp_tpu.eval.metrics import multilabel_report
from fedmlp_tpu.fl import fedavg as agg_fedavg
from fedmlp_tpu.models import build_model
from fedmlp_tpu.models.factory import init_model
from fedmlp_tpu.parallel import make_mesh, shard_stacked
from fedmlp_tpu.parallel import fl_runtime as rt

log = logging.getLogger("fedmlp_tpu")


@dataclass
class RoundRecord:
    round: int
    client_losses: list
    metrics: Optional[dict] = None
    seconds: float = 0.0


@dataclass
class Trainer:
    cfg: Config
    train_ds: Optional[ArrayDataset] = None
    test_ds: Optional[ArrayDataset] = None
    dict_users: Optional[dict] = None
    use_mesh: bool = True
    images_npy: Optional[str] = None  # packed shard path for host_stream
    history: list = field(default_factory=list)

    def __post_init__(self):
        cfg = self.cfg
        self._validate_cfg(cfg)
        self.rng = np.random.RandomState(cfg.seed)
        _t0 = time.time()
        _timing = os.environ.get("FEDMLP_TPU_TIMING")

        def _tick(msg):
            nonlocal _t0
            if _timing:
                now = time.time()
                log.warning("init %s: %.2fs", msg, now - _t0)
                print(f"init {msg}: {now - _t0:.2f}s", flush=True)
                _t0 = now

        if self.train_ds is None:
            self.train_ds = make_synthetic_dataset(
                cfg.data.synthetic_train_size, cfg.data.n_classes,
                cfg.data.image_size, seed=cfg.seed,
            )
            self.test_ds = make_synthetic_dataset(
                cfg.data.synthetic_test_size, cfg.data.n_classes,
                cfg.data.image_size, seed=cfg.seed + 1,
            )
        assert self.train_ds.n_classes == cfg.data.n_classes
        _tick("datasets")

        # ---- partition, with on-disk caches keyed like the reference's
        # iid-dictusers/*.npy files (reference: dataset/dataset.py:168-180)
        if self.dict_users is None:
            cache = None
            if cfg.output_dir:
                tag = (
                    # dataset size is part of the key: synthetic fixtures of
                    # different sizes must not share a cached partition
                    f"{self.train_ds.name}_{len(self.train_ds)}"
                    f"_{cfg.seed}_{cfg.n_clients}"
                    + ("" if cfg.iid else f"_{cfg.alpha_dirichlet}")
                )
                cache_dir = os.path.join(
                    cfg.output_dir,
                    "iid-dictusers" if cfg.iid else "non-iid-dictusers",
                )
                cache = os.path.join(cache_dir, tag + ".npy")
            if cfg.algorithm == "centralized" or cfg.n_clients == 1:
                self.dict_users = {0: list(range(len(self.train_ds)))}
            elif cache and os.path.exists(cache):
                self.dict_users = np.load(cache, allow_pickle=True).item()
            else:
                if cfg.iid:
                    self.dict_users = iid_sampling(
                        len(self.train_ds), cfg.n_clients, cfg.seed
                    )
                else:
                    self.dict_users = non_iid_dirichlet_sampling(
                        self.train_ds.targets, cfg.n_classes, 1.0,
                        cfg.n_clients, cfg.seed, cfg.alpha_dirichlet,
                    )
                if cache:
                    os.makedirs(os.path.dirname(cache), exist_ok=True)
                    np.save(cache, self.dict_users, allow_pickle=True)
        self.n_clients = len(self.dict_users)
        _tick("partition")

        # ---- label hiding (reference: main.py:58-66) ----
        self.hidden = build_hidden_mask(
            self.train_ds.targets, cfg.p_pos, np.random.RandomState(cfg.seed)
        )
        if cfg.algorithm == "centralized":
            self.active_lists = [list(range(cfg.n_classes))]
            self.hidden[:] = False
        else:
            self.active_lists = active_class_lists(cfg)[: self.n_clients]

        # ---- device-resident federation state ----
        self.host_stream = bool(cfg.data.host_stream)
        self.loader = None
        if self.host_stream:
            from fedmlp_tpu.data.native_loader import PackLoader

            npy = self.images_npy or (
                cfg.data.root and os.path.join(cfg.data.root, "train",
                                               "images.npy")
            )
            assert npy and os.path.exists(npy), (
                "host_stream requires a packed images.npy (data.root or "
                "Trainer(images_npy=...))"
            )
            # Reused output buffers avoid this host's pathological
            # fresh-page fault cost (~13 MB/s); safe only when jnp.asarray
            # copies to a real device (CPU backend may alias numpy memory),
            # and every consumer blocks on the transfer before the next
            # same-shape load can overwrite the buffer.
            self.loader = PackLoader(
                npy, reuse_buffers=jax.default_backend() != "cpu")
        self.fd = rt.build_federated_data(
            self.train_ds.images, self.train_ds.targets, self.dict_users,
            self.hidden, self.active_lists,
            mean=cfg.data.mean, std=cfg.data.std,
            device_images=not self.host_stream,
        )
        if self.fd.images is not None:
            jax.block_until_ready(self.fd.images)
        _tick("federated data on device")
        self.dict_len = np.asarray(self.fd.n_local)
        self.class_active_clients, self.class_negative_clients = class_client_lists(
            np.asarray(self.fd.active)
        )

        # ---- model ----
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.model = build_model(cfg.model, cfg.n_classes, compute_dtype=dtype,
                                 dw_backend=cfg.dw_backend or None,
                                 remat=bool(cfg.remat),
                                 remat_stages=tuple(
                                     int(s) for s in cfg.remat_stages.split(",")
                                     if s.strip()) if cfg.remat_stages else ())
        self.global_vars = init_model(
            self.model, jax.random.PRNGKey(cfg.seed), cfg.data.image_size,
            batch=2,
        )

        if cfg.pretrained_path:
            from fedmlp_tpu.models.factory import load_pretrained

            self.global_vars, n_loaded, _missing = load_pretrained(
                self.global_vars, cfg.pretrained_path
            )
            log.info("loaded %d pretrained arrays from %s", n_loaded,
                     cfg.pretrained_path)
        jax.block_until_ready(self.global_vars)
        _tick("model init")

        # ---- mesh ----
        self.mesh = (
            make_mesh(data_shards=max(1, cfg.mesh.data_axis))
            if self.use_mesh else None
        )

        # ---- algorithm ----
        self.weight_stream_dtype = (
            jnp.bfloat16
            if cfg.weight_stream and cfg.compute_dtype == "bfloat16"
            else None
        )
        self.algo = algo_registry.get_algorithm(cfg.algorithm)
        algo_loss = self.algo.loss_fn
        view_concat = cfg.view_concat
        if view_concat == "auto":
            view_concat = (
                "on" if jax.devices()[0].platform == "tpu" else "off"
            )
        if (view_concat == "on"
                and hasattr(self.algo, "loss_fn_viewcat")):
            algo_loss = self.algo.loss_fn_viewcat
            log.info("engine: dual views concatenated into one 2B forward")
        viewcat_active = algo_loss is getattr(self.algo, "loss_fn_viewcat",
                                              None)
        view_precat = cfg.view_precat
        if view_precat == "auto":
            # measured NEUTRAL on the flagship (round-4 A/B: the layout
            # conversion moves to the step-level concat instead of
            # disappearing) — default off, kept as a tested knob
            view_precat = "off"
        # hoist the 2B concat out of the per-client map (lockstep only;
        # only meaningful when the viewcat loss is the active loss)
        use_precat = view_precat == "on" and viewcat_active
        is_mapped = not (self._use_stacked() or self._use_lockstep())
        self._pre_augment_chunk = self._resolve_pre_augment(cfg, is_mapped)
        if self._pre_augment_chunk:
            self._pre_augment_backend = rt.resolve_augment_backend(
                cfg.data.augment_backend, self.algo.VIEW_MODE, scale=None)
            log.warning(
                "engine: pre-augmenting round views OUTSIDE the round "
                "program (%d-image chunks, backend=%s) — weak+strong "
                "at-scale crash dodge (fl_runtime.pre_augment_views)",
                self._pre_augment_chunk, self._pre_augment_backend,
            )
        if self._use_stacked():
            self.round_fn = rt.make_stacked_local_round(
                self.model,
                self.algo.stacked_loss_fn,
                lr=cfg.base_lr,
                batch_size=cfg.batch_size,
                mean=cfg.data.mean,
                std=cfg.data.std,
                view_mode=self.algo.VIEW_MODE,
                needs_global=self.algo.NEEDS_GLOBAL,
                donate=True,
                augment_backend=cfg.data.augment_backend,
                augment_scale=self.n_clients * cfg.batch_size,
                scan_unroll=cfg.scan_unroll,
                hoist_augment=bool(cfg.hoist_augment),
            )
            log.info("engine: channel-stacked lockstep clients")
        elif self._use_lockstep():
            self.round_fn = rt.make_lockstep_local_round(
                self.model,
                algo_loss,
                lr=cfg.base_lr,
                batch_size=cfg.batch_size,
                mean=cfg.data.mean,
                std=cfg.data.std,
                view_mode=self.algo.VIEW_MODE,
                needs_global=True,
                donate=True,
                mesh=self.round_mesh,
                augment_backend=cfg.data.augment_backend,
                augment_scale=self.n_clients * cfg.batch_size,
                scan_unroll=cfg.scan_unroll,
                client_unroll=bool(cfg.client_unroll),
                view_precat=use_precat,
                small_pack=cfg.small_pack,
            )
            log.info("engine: lockstep mapped clients (K·B-batched "
                     "frozen-global forwards)")
        else:
            self.round_fn = rt.make_local_round(
                self.model,
                algo_loss,
                lr=cfg.base_lr,
                batch_size=cfg.batch_size,
                mean=cfg.data.mean,
                std=cfg.data.std,
                view_mode=self.algo.VIEW_MODE,
                needs_global=self.algo.NEEDS_GLOBAL,
                donate=True,
                mesh=self.round_mesh,
                augment_backend=cfg.data.augment_backend,
                # pre-augmented rounds never run the in-engine augmentation,
                # so skip the at-scale 'gather' backend downgrade
                augment_scale=(None if self._pre_augment_chunk
                               else self.n_clients * cfg.batch_size),
                scan_unroll=cfg.scan_unroll,
                hoist_augment=bool(cfg.hoist_augment),
                weight_stream_dtype=self.weight_stream_dtype,
            )
        self.server_state = (
            self.algo.init_server_state(self) if hasattr(self.algo, "init_server_state")
            else {}
        )
        self.eval_probs = rt.make_eval_fn(
            self.model, cfg.data.mean, cfg.data.std,
            batch_size=cfg.batch_size * 4,
        )
        self._jkey = jax.random.PRNGKey(cfg.seed)
        self.iter_num = 0  # lifetime local-step counter (reference iter_num)

        # jitted tree-level helpers: eager per-leaf ops are pathological on
        # remote-tunneled backends (~1 RPC per leaf per op)
        K = self.n_clients
        self._broadcast_jit = jax.jit(
            lambda gv: rt.broadcast_to_clients(gv, K)
        )
        self._fedavg_jit = jax.jit(agg_fedavg)
        _tick("runtime setup")

    # ------------------------------------------------------------------
    @staticmethod
    def _validate_cfg(cfg: Config) -> None:
        """Reject engine-capability edges up front with a typed error
        instead of a mid-round assert (VERDICT round-4 item 7)."""
        dp = max(1, cfg.mesh.data_axis)
        if dp > 1:
            algo = algo_registry.get_algorithm(cfg.algorithm)
            if getattr(algo, "post_step", None) is not None:
                raise ValueError(
                    f"algorithm {cfg.algorithm!r} keeps per-client state "
                    "(post_step hook) which cannot shard over the 'data' "
                    "mesh axis (cstate would diverge across data shards); "
                    "set mesh.data_axis=1"
                )
            if cfg.batched_global == "on":
                raise ValueError(
                    "batched_global='on' (lockstep engine) requires "
                    "mesh.data_axis=1 — the lockstep loop order has no "
                    "per-client data-parallel path; set mesh.data_axis=1 "
                    "or batched_global='auto'/'off'"
                )
        if cfg.data.host_stream and cfg.client_stacking == "on":
            raise ValueError(
                "client_stacking='on' does not compose with "
                "data.host_stream — the stacked engine has no windowed "
                "carry; use the lockstep engine (batched_global) for "
                "streamed datasets"
            )

    # ------------------------------------------------------------------
    def _use_stacked(self) -> bool:
        """Channel-stacked lockstep clients (models/stacked.py): 'auto'
        currently resolves OFF — the mapped engine measured faster
        end-to-end (BENCH_NOTES.md) — and only a winning A/B will flip it;
        'on' forces stacking for supported (algorithm, model, no-mesh)
        combinations."""
        from fedmlp_tpu.models.stacked import supports_stacking

        mode = self.cfg.client_stacking
        if mode == "off":
            return False
        ok = (
            hasattr(self.algo, "stacked_loss_fn")
            and supports_stacking(self.model)
            and self.round_mesh is None
        )
        if mode == "on":
            if not ok:
                raise ValueError(
                    "client_stacking='on' but the algorithm/model/mesh "
                    "combination does not support stacked execution")
            return True
        # 'auto' stays OFF until the stacked program beats the mapped one
        # on TPU (first A/B: 2120 vs 2643 img/s — pointwise layout work in
        # progress, see BENCH_NOTES.md)
        return False

    def _resolve_pre_augment(self, cfg: Config, is_mapped: bool) -> int:
        """Chunk size for out-of-program view computation (0 = off).

        Auto (-1) engages exactly at the weak+strong at-scale TPU crash
        config; forcing it (>0) on a non-mapped engine is a typed error —
        the lockstep/stacked engines augment in-step and reject dict
        views (fl_runtime make_lockstep_local_round round_fn assert)."""
        if cfg.pre_augment == 0:
            return 0
        if cfg.pre_augment > 0:
            if not is_mapped:
                raise ValueError(
                    "pre_augment requires the mapped engine — the "
                    "lockstep/stacked engines augment in-step "
                    "(set batched_global/client_stacking off)")
            if self.host_stream and cfg.data.stream_window:
                raise ValueError(
                    "pre_augment does not compose with windowed "
                    "host-streaming (stream_window)")
            return cfg.pre_augment
        engage = (
            is_mapped
            and self.algo.VIEW_MODE == "weak_strong"
            and self.n_clients * cfg.batch_size
            >= rt.STRONG_SCALE_THRESHOLD
            and jax.devices()[0].platform == "tpu"
            and self.round_mesh is None
            and not self.host_stream
        )
        return 256 if engage else 0

    def _use_lockstep(self) -> bool:
        """Lockstep loop order (batched frozen-global forwards): 'auto'
        engages on TPU for NEEDS_GLOBAL algorithms when there is no
        per-client data-axis sharding; 'on' forces it anywhere."""
        mode = self.cfg.batched_global
        if mode == "off":
            return False
        ok = (
            getattr(self.algo, "NEEDS_GLOBAL", False)
            and (self.mesh is None or self.mesh.shape.get("data", 1) == 1)
        )
        if mode == "on":
            if not ok:
                raise ValueError(
                    "batched_global='on' needs a NEEDS_GLOBAL algorithm "
                    "and no data-axis sharding")
            return True
        return ok and jax.devices()[0].platform == "tpu"

    # ------------------------------------------------------------------
    def client_ctx(self) -> dict:
        fd = self.fd
        active_f = fd.active.astype(jnp.float32)
        # loss_w_unknown: 1 everywhere except active classes (reference:
        # utils/local_training.py:41-42)
        loss_w_unknown = active_f * fd.loss_w + (1.0 - active_f)
        ctx = {
            "active": active_f,
            "negative": 1.0 - active_f,
            "loss_w": fd.loss_w,
            "loss_w_unknown": loss_w_unknown,
            "class_num": fd.class_num,
            "n_local": fd.n_local.astype(jnp.float32),
        }
        if hasattr(self.algo, "extra_ctx"):
            ctx.update(self.algo.extra_ctx(self))
        return ctx

    # ------------------------------------------------------------------
    def apply_corrections(self, corr: dict) -> int:
        """Inject label corrections into the observed-label tables: the
        DatasetSplit ``corr_idx`` capability (reference:
        utils/local_training.py:1352-1355) — for samples listed per
        (client, missing class), the observed label flips to positive.

        ``corr`` maps client → {class → iterable of GLOBAL sample indices}.
        Returns the number of flipped cells."""
        import dataclasses as _dc

        obs = np.asarray(self.fd.obs_targets).copy()
        idx = np.asarray(self.fd.idx)
        valid = np.asarray(self.fd.valid)
        active = np.asarray(self.fd.active)
        flipped = 0
        for k, per_class in corr.items():
            for c, gidxs in per_class.items():
                if active[k, c]:
                    continue  # reference corrects only missing classes
                mask = np.isin(idx[k], np.asarray(list(gidxs))) & valid[k]
                flipped += int((obs[k, mask, c] != 1.0).sum())
                obs[k, mask, c] = 1.0
        self.fd = _dc.replace(self.fd, obs_targets=jnp.asarray(obs))
        return flipped

    # ------------------------------------------------------------------
    def local_pass(self, round_fn, sample_arrays: dict, scalars: dict,
                   extra_state: dict | None = None):
        """One local-training pass for all clients with fresh batch plans;
        returns (state, mean_losses, aux). ``extra_state`` may carry
        'teacher'/'cstate' entries for algorithms that persist them."""
        cfg = self.cfg
        pos, pos_valid, _ = rt.make_batch_plan(
            self.rng, np.asarray(self.fd.valid), cfg.batch_size, cfg.local_ep
        )
        stacked = self._broadcast_jit(self.global_vars)
        if self.mesh is not None and self.n_clients % self.mesh.shape["client"] == 0:
            stacked = shard_stacked(self.mesh, stacked)
        self._jkey, sub = jax.random.split(self._jkey)
        state = {"vars": stacked}
        if extra_state:
            state.update(extra_state)
        data = {
            "ctx": self.client_ctx(),
            "global_vars": self.global_vars,
        }
        pos_j = jnp.asarray(pos)
        if self.host_stream:
            # native threaded loader gathers uint8 batches out of the
            # memory-mapped shard; only the small tables gather on device
            gidx = np.asarray(self.fd.idx)[
                np.arange(self.n_clients)[None, :, None], pos
            ]  # [S, K, B]
            W = self.cfg.data.stream_window
            if (W and pos.shape[0] > W
                    and hasattr(round_fn, "init_carry")):
                return self._windowed_pass(
                    round_fn, gidx, sample_arrays, scalars, state, data,
                    pos, pos_valid, sub, W,
                )
            imgs = jnp.asarray(self.loader.gather(gidx.astype(np.int64)))
            if self.loader.reuse:
                imgs.block_until_ready()
            sample = rt.gather_round_samples(self.fd.idx, sample_arrays, pos_j)
        else:
            imgs, sample = rt.gather_round_data(
                self.fd.images, self.fd.idx, sample_arrays, pos_j
            )
        if self._pre_augment_chunk:
            # views computed as standalone small programs; the round
            # program consumes the hoist-form dict (bitwise-identical to
            # hoist_augment=1 — tests/test_pre_augment.py)
            imgs = rt.pre_augment_views(
                imgs, sub,
                view_mode=self.algo.VIEW_MODE,
                augment_backend=self._pre_augment_backend,
                mean=self.cfg.data.mean, std=self.cfg.data.std,
                chunk=self._pre_augment_chunk,
            )
        plan = {
            "images": imgs,
            "sample": sample,
            "pos": pos_j,
            "pos_valid": jnp.asarray(pos_valid),
            "key": sub,
            "iter0": jnp.float32(self.iter_num),
        }
        out_state, losses, aux = round_fn(state, data, plan, scalars)
        self.iter_num += pos.shape[0]
        return out_state, losses, aux

    def _windowed_pass(self, round_fn, gidx, sample_arrays, scalars, state,
                       data, pos, pos_valid, key, W):
        """Host-streamed round in W-step windows: only W·K·B uint8 images
        are resident in HBM at a time (an ICH-scale round is ~27 GB of
        images — reference preprocess/ICH_process.py:45-46 — which cannot
        be gathered up front). The native loader prefetches window w+1
        from disk while window w trains on device; Adam state, the RNG
        stream and the loss accumulators thread through the engine's
        carry so the windowed round equals the unwindowed one exactly
        (tests/test_stream_window.py). Teacher/cstate (RSCFed, FedIRM,
        RoFL) ride their regular state entries across windows; per-step
        aux (e.g. FedIRM confusion matrices) sums here on the host."""
        S = pos.shape[0]
        pos_j = jnp.asarray(pos)
        sample = rt.gather_round_samples(self.fd.idx, sample_arrays, pos_j)
        valid_j = jnp.asarray(pos_valid)
        state = dict(state)
        state.update(round_fn.init_carry(
            state["vars"], key, jnp.float32(self.iter_num)))
        gidx = gidx.astype(np.int64)
        self.loader.submit(gidx[:W])
        losses = None
        aux_total = None
        w0 = 0
        prev_losses = None
        while w0 < S:
            w1 = min(w0 + W, S)
            chunk = self.loader.wait()
            if w1 < S:
                self.loader.submit(gidx[w1:min(w1 + W, S)])
            imgs = jnp.asarray(chunk)
            if self.loader.reuse:
                # transfer must land before the next wait() reuses the buffer
                imgs.block_until_ready()
            plan = {
                "images": imgs,
                "sample": jax.tree_util.tree_map(
                    lambda x: x[w0:w1], sample),
                "pos": pos_j[w0:w1],
                "pos_valid": valid_j[w0:w1],
                # key/iter0 ride the carry in windowed mode; the plan
                # entries keep the argument structure uniform
                "key": key,
                "iter0": jnp.float32(self.iter_num),
            }
            if prev_losses is not None:
                # Depth-2 dispatch bound: without this every window's
                # device_put + step enqueues immediately and each pending
                # step pins its ~W·K·B-image buffers (on the tunneled
                # backend device buffers carry host shadows — an ICH-scale
                # round grew host RSS by ~57 GB). Blocking on window w-1's
                # losses before dispatching w+1 keeps at most two windows
                # in flight while disk prefetch and the w'th transfer
                # still overlap the w-1'th compute.
                jax.block_until_ready(prev_losses)
            state, losses, aux = round_fn(state, data, plan, scalars)
            aux_total = (aux if aux_total is None else
                         jax.tree_util.tree_map(jnp.add, aux_total, aux))
            prev_losses = losses
            w0 = w1
        self.iter_num += S
        out_state = {"vars": state["vars"]}
        for name in ("teacher", "cstate"):
            if name in state:
                out_state[name] = state[name]
        return out_state, losses, aux_total if aux_total is not None else {}

    @property
    def round_mesh(self):
        """Mesh for shard_map'd parallelism: client axis splits the client
        population; the optional data axis splits each client's batch.
        Non-divisible client counts shard via no-op dummy-client padding
        inside the engines (fl_runtime._pad_clients_tree — K=20 on an
        8-device mesh runs as 24 padded clients, 3 per device).
        None → single-shard lax.map."""
        m = self.mesh
        if m is None:
            return None
        cl = m.shape["client"]
        dp = m.shape.get("data", 1)
        if ((cl > 1 or dp > 1)
                and self.cfg.batch_size % dp == 0):
            return m
        return None

    def next_key(self):
        self._jkey, sub = jax.random.split(self._jkey)
        return sub

    def aggregate(self, svars, weights):
        """Jitted dataset-size-weighted FedAvg over the stacked client axis."""
        return self._fedavg_jit(svars, jnp.asarray(weights, jnp.float32))

    def broadcast(self, global_vars):
        return self._broadcast_jit(global_vars)

    # ------------------------------------------------------------------
    def run_round(self, rnd: int) -> RoundRecord:
        cfg = self.cfg
        t0 = time.time()
        if hasattr(self.algo, "custom_round"):
            losses = self.algo.custom_round(self, rnd)
            rec = RoundRecord(rnd, np.asarray(losses).tolist(), None,
                              time.time() - t0)
            if (rnd + 1) % cfg.eval_every == 0 or rnd == cfg.rounds_warmup - 1:
                rec.metrics = self.evaluate()
                log.info("round %d metrics: %s", rnd, rec.metrics)
            self.history.append(rec)
            return rec
        scalars = self.round_scalars(rnd)
        state, losses, _ = self.local_pass(
            self.round_fn, {"labels": self.fd.obs_targets}, scalars
        )
        svars = state["vars"]

        # server aggregation (algorithm may override)
        if hasattr(self.algo, "server_update"):
            self.global_vars, self.server_state = self.algo.server_update(
                self, rnd, svars, self.server_state
            )
        else:
            self.global_vars = self.aggregate(svars, self.dict_len)

        rec = RoundRecord(rnd, np.asarray(losses).tolist(), None, time.time() - t0)

        if (rnd + 1) % cfg.eval_every == 0 or rnd == cfg.rounds_warmup - 1:
            rec.metrics = self.evaluate()
            log.info(
                "round %d metrics: mAP %.4f auc %.4f bacc %.4f", rnd,
                rec.metrics["mAP"], rec.metrics["auc"], rec.metrics["BACC"],
            )
        self.history.append(rec)
        return rec

    def round_scalars(self, rnd: int) -> dict:
        base = {"rnd": jnp.float32(rnd)}
        if hasattr(self.algo, "round_scalars"):
            base.update(self.algo.round_scalars(self, rnd))
        return base

    # ------------------------------------------------------------------
    def evaluate(self) -> dict:
        # test images stay a host array (possibly an np.memmap of the packed
        # shard); eval_probs streams them chunk-by-chunk so the test set is
        # never resident in HBM (full-scale ICH test ≈ 8 GB)
        probs = self.eval_probs(self.global_vars, self.test_ds.images)
        return multilabel_report(self.test_ds.targets, probs)

    def run(self, rounds: Optional[int] = None) -> list:
        rounds = rounds if rounds is not None else self.cfg.rounds_warmup
        for rnd in range(rounds):
            rec = self.run_round(rnd)
            log.info(
                "round %d done in %.2fs, losses %s", rnd, rec.seconds,
                np.round(rec.client_losses, 4),
            )
        return self.history
