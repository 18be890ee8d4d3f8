"""SPMD federated-learning runtime.

The reference's round loop hands each client a deepcopy of the global model
and trains them one-by-one on a single GPU (reference: main.py:135-197).
Here one federated round is ONE compiled XLA program:

  * client variables stacked on a leading [K, ...] axis (params + BN stats
    + Adam state), sharded over the ``client`` mesh axis;
  * the per-round batch plan is a static-shape tensor of positions
    [S, K, B] into each client's padded index table, with validity masks
    standing in for ragged batches;
  * each step gathers uint8 images from the device-resident dataset,
    augments the views on device, and runs the per-client grad steps
    (lax.map over K — or channel-stacked lockstep, models/stacked.py);
  * server aggregation is a weighted reduction over the client axis.

Parity notes vs the reference:
  * Adam is re-initialized every round (the reference constructs a fresh
    torch.optim.Adam per call, e.g. utils/local_training.py:912-913) and
    uses torch semantics (L2 term added to the gradient before moments).
  * Loss normalization divides by the CONFIGURED batch size, so ragged last
    batches contribute proportionally less, exactly like the reference
    (e.g. utils/local_training.py:956-959 divides by args.batch_size).
"""

from __future__ import annotations

import dataclasses
import logging
import os
from functools import lru_cache, partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fedmlp_tpu.data.masking import (
    build_active_matrix,
    build_client_index_table,
    observed_targets,
)
from fedmlp_tpu.ops import augment as A

log = logging.getLogger("fedmlp_tpu")


# ----------------------------------------------------------------------
# Optimizer: torch.optim.Adam(lr, betas=(0.9, 0.999), weight_decay=5e-4)
# (reference: utils/local_training.py:636-637) — L2 added to grad.
# ----------------------------------------------------------------------

def _round_jit(fn, donate: bool):
    """jit with optional XLA compiler-option overrides from the
    FEDMLP_COMPILER_OPTIONS env var ('flag=value,flag=value') — the
    same-process A/B hook for TPU compiler experiments (scoped-vmem
    limits, scheduler toggles) on the round programs."""
    kw = {}
    opts = os.environ.get("FEDMLP_COMPILER_OPTIONS")
    if opts:
        kw["compiler_options"] = dict(
            kv.split("=", 1) for kv in opts.split(",") if "=" in kv
        )
    return jax.jit(fn, donate_argnums=(0,) if donate else (), **kw)


def torch_adam(lr: float, weight_decay: float = 5e-4, b1=0.9, b2=0.999, eps=1e-8):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale(-lr),
    )


# ----------------------------------------------------------------------
# Federated data: device-resident packed arrays + per-client tables
# ----------------------------------------------------------------------

@dataclasses.dataclass
class FederatedData:
    """All static data of a federation, ready for device gathers."""

    images: jnp.ndarray | None   # uint8 [N, H, W, 3]; None = host-streamed
    targets: jnp.ndarray         # f32 [N, C] (TRUE labels — eval/diagnostics)
    obs_targets: jnp.ndarray     # f32 [K, M, C] observed (masked) labels
    idx: jnp.ndarray             # i32 [K, M] global sample index table
    valid: jnp.ndarray           # bool [K, M]
    active: jnp.ndarray          # bool [K, C]
    loss_w: jnp.ndarray          # f32 [K, C] pos_weight = N_k / class_count
    class_num: jnp.ndarray       # f32 [K, C] true per-class counts
    n_local: jnp.ndarray         # i32 [K]
    mean: tuple
    std: tuple

    @property
    def n_clients(self) -> int:
        return self.idx.shape[0]

    @property
    def n_classes(self) -> int:
        return self.targets.shape[1]

    @property
    def max_local(self) -> int:
        return self.idx.shape[1]


def build_federated_data(
    images: np.ndarray,
    targets: np.ndarray,
    dict_users: dict[int, list[int]],
    hidden: np.ndarray,
    active_class_lists: list[list[int]],
    mean=(0.485, 0.456, 0.406),
    std=(0.229, 0.224, 0.225),
    device_images: bool = True,
) -> FederatedData:
    """Densify the reference's Python-side bookkeeping into arrays.

    Mirrors: DatasetSplit construction + get_num_of_each_class + loss_w
    (reference: utils/local_training.py:38-43) and the label masking of
    DatasetSplit.__getitem__ (:1347-1356).
    """
    K = len(active_class_lists)
    C = targets.shape[1]
    idx, valid = build_client_index_table(dict_users, K)
    active = build_active_matrix(active_class_lists, C)

    M = idx.shape[1]
    obs = np.zeros((K, M, C), np.float32)
    loss_w = np.zeros((K, C), np.float32)
    class_num = np.zeros((K, C), np.float32)
    n_local = valid.sum(1).astype(np.int32)
    for k in range(K):
        tk = targets[idx[k]]  # [M, C] true labels of this client's samples
        obs[k] = observed_targets(tk, hidden[idx[k]], active[k])
        obs[k][~valid[k]] = 0.0
        # loss_w from TRUE counts (reference get_num_of_each_class sums true
        # targets, utils/local_training.py:1358-1362)
        cn = (tk * valid[k][:, None]).sum(0)
        class_num[k] = cn
        loss_w[k] = n_local[k] / np.maximum(cn, 1e-12)
    return FederatedData(
        images=jnp.asarray(images) if device_images else None,
        targets=jnp.asarray(targets, jnp.float32),
        obs_targets=jnp.asarray(obs),
        idx=jnp.asarray(idx),
        valid=jnp.asarray(valid),
        active=jnp.asarray(active),
        loss_w=jnp.asarray(loss_w),
        class_num=jnp.asarray(class_num),
        n_local=jnp.asarray(n_local),
        mean=tuple(mean),
        std=tuple(std),
    )


# ----------------------------------------------------------------------
# Batch plan: host-side shuffling → static-shape position tensors
# ----------------------------------------------------------------------

def make_batch_plan(
    rng: np.random.RandomState,
    valid: np.ndarray,
    batch_size: int,
    local_ep: int,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Per-epoch shuffled batch positions for every client.

    Returns (pos [S, K, B], pos_valid [S, K, B], steps_per_epoch) where
    S = local_ep · max_k ceil(n_k / B). Clients with fewer samples get
    padding entries with pos_valid=False (their loss contribution is 0,
    matching the reference's divide-by-configured-batch semantics).
    """
    valid = np.asarray(valid)
    K, M = valid.shape
    sizes = valid.sum(1)
    steps = int(np.ceil(sizes.max() / batch_size))
    S = local_ep * steps
    pos = np.zeros((S, K, batch_size), np.int32)
    pos_valid = np.zeros((S, K, batch_size), bool)
    for k in range(K):
        mine = np.where(valid[k])[0]
        for e in range(local_ep):
            perm = rng.permutation(mine)
            padded = np.zeros(steps * batch_size, np.int32)
            vmask = np.zeros(steps * batch_size, bool)
            padded[: len(perm)] = perm
            vmask[: len(perm)] = True
            sl = slice(e * steps, (e + 1) * steps)
            pos[sl, k] = padded.reshape(steps, batch_size)
            pos_valid[sl, k] = vmask.reshape(steps, batch_size)
    return pos, pos_valid, steps


# ----------------------------------------------------------------------
# Variable stacking
# ----------------------------------------------------------------------

def broadcast_to_clients(tree, n_clients: int):
    """Tile global variables to a stacked [K, ...] pytree (the reference's
    per-client deepcopy(netglob), main.py:139)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_clients,) + x.shape), tree
    )


def tree_index(tree, i):
    return jax.tree_util.tree_map(lambda x: x[i], tree)


# ----------------------------------------------------------------------
# Client-axis padding: shard K clients over S shards when S ∤ K
# ----------------------------------------------------------------------

def padded_client_count(K: int, n_shards: int) -> int:
    """Smallest client count ≥ K divisible by the shard count."""
    return ((K + n_shards - 1) // n_shards) * n_shards


def _pad_clients_tree(tree, pad: int, axis: int = 0, zero: bool = False):
    """Pad every leaf's client axis with ``pad`` edge-replicated entries
    (``zero=True`` pads with zeros — used for validity masks, making the
    padded clients all-invalid). Edge replication keeps the padded rows'
    math finite (real weights, real pixels); with pos_valid=0 every padded
    step is a no-op under the engines' where(has_any) masking and the
    padded rows are sliced away afterwards (_slice_clients_tree)."""
    if pad == 0:
        return tree

    def p(x):
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        return jnp.pad(x, widths, mode="constant" if zero else "edge")

    return jax.tree_util.tree_map(p, tree)


def _slice_clients_tree(tree, K: int, axis: int = 0):
    """Inverse of _pad_clients_tree: drop the padded client rows."""

    def s(x):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(0, K)
        return x[tuple(idx)]

    return jax.tree_util.tree_map(s, tree)


# ----------------------------------------------------------------------
# Round-data gather (its own jitted program — see round_fn docstring)
# ----------------------------------------------------------------------

@jax.jit
def gather_round_samples(idx, sample_arrays, pos):
    """Host-stream variant: gather only the small per-sample tables on
    device; images come from the native loader (data/native_loader.py)."""
    S, K, B = pos.shape
    karange = jnp.arange(K)[None, :, None]
    return {k: v[karange, pos] for k, v in sample_arrays.items()}


@jax.jit
def gather_round_data(images, idx, sample_arrays, pos):
    """(images [N,...], idx [K,M], sample {name: [K,M,...]}, pos [S,K,B])
    → (imgs [S,K,B,...], sample {name: [S,K,B,...]})."""
    S, K, B = pos.shape
    karange = jnp.arange(K)[None, :, None]
    gidx = idx[karange, pos]  # [S, K, B]
    imgs = images[gidx]
    sample = {k: v[karange, pos] for k, v in sample_arrays.items()}
    return imgs, sample


def pre_augment_views(imgs, key, *, view_mode, augment_backend, mean, std,
                      chunk=256):
    """Compute the round's augmented views OUTSIDE the round program, as a
    sequence of small independent jitted programs of ``chunk`` images each.

    Crash-dodge fallback for the weak+strong (FixMatch/CBAFed-style)
    TPU-worker fault at scale: the fault follows the fused round program
    that carries the strong RandAugment pipeline at K·B ≥ 640 (BENCH_NOTES
    "Round-4/5 BASELINE ladder"; the 'gather' weak backend inside the same
    big program crashed identically in round 5), while small standalone
    augmentation programs match the K=4 scale that has never crashed. The
    round program then consumes pre-augmented dense views — the same dict
    form the mapped engine's ``hoist_augment`` path produces in-program
    (make_local_round round_fn), so ``client_step`` needs no changes.

    RNG-identical to ``hoist_augment=1``: the per-image key tables are
    exactly what the backends would derive internally for the UNCHUNKED
    call (weak: split(k1, 2N); strong: split(k2, 3N) — ops/augment.py:
    347-380), so the output is invariant to ``chunk`` BITWISE, and the
    round trajectory matches the hoist path to f32 roundoff (separate
    programs fuse the augment math in a different context than the
    in-round hoist — tests/test_pre_augment.py).

    imgs [S,K,B,H,W,C] uint8 → {"x"|"x1","x2": f32 [S,K,B,H,W,C]}.
    """
    S, K, B = imgs.shape[:3]
    N = S * K * B
    flat = imgs.reshape((N,) + imgs.shape[3:])
    kh = jax.random.fold_in(key, 0x9A)  # the hoist path's stream
    k1, k2 = jax.random.split(kh)
    pad = (-N) % chunk
    if pad:
        flat = jnp.concatenate([flat, flat[:pad]], axis=0)

    mean_t = tuple(float(m) for m in mean)
    std_t = tuple(float(s) for s in std)

    def run(kind, kfull, n_per):
        keys_tab = jax.random.split(kfull, n_per * N).reshape(N, n_per, 2)
        if pad:
            keys_tab = jnp.concatenate([keys_tab, keys_tab[:pad]], axis=0)
        cfn = _pre_aug_chunk_fn(augment_backend, kind, mean_t, std_t)
        parts = [cfn(flat[c:c + chunk], keys_tab[c:c + chunk], kfull)
                 for c in range(0, N + pad, chunk)]
        v = jnp.concatenate(parts, axis=0)[:N]
        return v.reshape((S, K, B) + v.shape[1:])

    if view_mode == "single":
        return {"x": run("weak", k1, 2)}
    x1 = run("weak", k1, 2)
    if view_mode == "dual":
        x2 = run("weak", k2, 2)
    else:
        x2 = run("strong", k2, 3)
    return {"x1": x1, "x2": x2}


@lru_cache(maxsize=None)
def _pre_aug_chunk_fn(augment_backend, kind, mean_t, std_t):
    """One jitted chunk program per (backend, view-kind, norm constants) —
    cached so per-round calls reuse the compiled executable."""
    fn = (_pick_weak_backend(augment_backend) if kind == "weak"
          else _pick_strong_backend(augment_backend))
    return jax.jit(lambda x, ks, k: fn(x, k, mean_t, std_t, keys=ks))


# ----------------------------------------------------------------------
# Generic local-round executor
# ----------------------------------------------------------------------

LossFn = Callable[..., tuple[jnp.ndarray, tuple]]



# weak+strong programs above this K·B scale route 'auto' to the 'gather'
# weak backend on TPU (see resolve_augment_backend below). 640 = the
# crashing K=20·B=32 config; 128 = the K=4 config that has never crashed.
STRONG_SCALE_THRESHOLD = int(
    os.environ.get("FEDMLP_STRONG_SCALE_THRESHOLD", "256"))


def resolve_augment_backend(augment_backend: str, view_mode: str = "single",
                            platform: str | None = None,
                            scale: int | None = None):
    """Resolve 'auto' to a concrete weak-augment backend.

    TPU: the fused v3/v4 block-parallel warp kernel (one dynamic roll per
    8-row block + static-tap lerp) beat the v1 3-kernel Paeth pipeline
    +6.9% on the flagship stage-1 round (probe_warp_round, round 3); the
    gather-based bilinear warp is ~5x slower than either. Off-TPU the jnp
    gather formulation is the fast one.

    EXCEPTION: programs that also carry the strong-view RandAugment
    pipeline ('weak_strong', i.e. FixMatch/CBAFed-style clients) have
    crashed the TPU worker at scale (K=20 B=32 224px, UNAVAILABLE
    kernel fault) — twice with the fused kernel (round 3; round-4
    ladder rung 5 at 4 steps/round) and once with the v1 'pallas'
    pipeline (round-4 re-measure, 5/5 deterministic in that session).
    The fault is FLAKY across sessions (the identical config also
    passes; see BENCH_NOTES "Round-4: BASELINE ladder") and follows the
    weak+strong program, not the weak backend — a libtpu-level fault we
    cannot patch. 'auto' therefore resolves per scale:

      * K·B < STRONG_SCALE_THRESHOLD (e.g. K=4 B=32, never crashed):
        'pallas' (fewest observed crashes among the fast kernels);
      * K·B ≥ threshold (``scale`` given by the Trainer): 'gather' —
        the only weak backend that has PASSED the K=20 crash config
        (round-3 probe matrix, fixmatch_k20_gather). ~5x slower weak
        warp, but a slower number beats a crash record (VERDICT r4
        item 4).

    Regression: tests/test_augment.py::
    test_auto_backend_weak_strong_fallback. Long runs should still use
    the retry-on-UNAVAILABLE runner (tools/resilient_run.py).
    """
    if augment_backend != "auto":
        return augment_backend
    if platform is None:
        platform = jax.devices()[0].platform
    if platform != "tpu":
        return "gather"
    if view_mode == "weak_strong":
        if scale is not None and scale >= STRONG_SCALE_THRESHOLD:
            log.warning(
                "weak_strong program at scale K*B=%d >= %d: selecting the "
                "'gather' weak backend (the only one that passed the "
                "fixmatch-at-scale TPU crash config)",
                scale, STRONG_SCALE_THRESHOLD,
            )
            return "gather"
        return "pallas"
    return "fused"


def _pick_strong_backend(augment_backend: str):
    """Strong-view (RandAugmentMC) pipeline; under the 'normonly'
    diagnostic backend BOTH views are normalize-only so perf probes and
    the head-to-head parity driver (tools/ref_parity — identity views on
    the torch side) compare like for like."""
    if augment_backend == "normonly":
        def strong(imgs, key, mean_, std_, keys=None):
            return A.eval_batch(imgs, mean_, std_)
        return strong
    if augment_backend in ("pallas", "fused"):
        # gather-free strong pipeline: prefix affine + pool geometric ops
        # through the Pallas roll kernel (ops/augment._geo_shear_warp) —
        # the vmapped bilinear gathers made strong ~70x the weak warp's
        # per-image cost on TPU (BENCH_NOTES round 5)
        def strong(imgs, key, mean_, std_, keys=None):
            return A.strong_augment_batch(imgs, key, mean_, std_,
                                          keys=keys, geo="shear")
        return strong
    return A.strong_augment_batch


def _pick_weak_backend(augment_backend: str):
    """Weak-augmentation implementation by name. 'auto' resolved upstream.

    * 'pallas'  — 3-kernel Paeth shear pipeline (ops/pallas_warp.py v1)
    * 'fused'   — single fused warp+normalize kernel (v2, lowest HBM traffic)
    * 'gather'  — jnp bilinear warp (fast on CPU, pathological on TPU)
    * 'normonly'— diagnostic: normalize without warp/flip (perf probes only)
    """
    if augment_backend == "normonly":
        def weak(imgs, key, mean_, std_, keys=None):
            return A.eval_batch(imgs, mean_, std_)
        return weak
    if augment_backend == "gather":
        return A.weak_augment_batch
    if augment_backend == "fused":
        from fedmlp_tpu.ops.pallas_warp import weak_augment_batch_fused

        def weak(imgs, key, mean_, std_, keys=None):
            return weak_augment_batch_fused(imgs, key, mean_, std_,
                                            use_pallas=True, keys=keys)
        return weak
    from fedmlp_tpu.ops.pallas_warp import weak_augment_batch_paeth

    def weak(imgs, key, mean_, std_, keys=None):
        return weak_augment_batch_paeth(
            imgs, key, mean_, std_,
            use_pallas=(augment_backend == "pallas"), keys=keys,
        )
    return weak


def make_local_round(
    model,
    loss_fn: LossFn,
    *,
    lr: float,
    batch_size: int,
    mean,
    std,
    view_mode: str = "single",  # 'single' | 'dual' | 'weak_strong'
    needs_global: bool = False,
    teacher_decay: float | None = None,  # per-step EMA teacher (RSCFed 0.999)
    teacher_iter_corrected: bool = False,  # FedIRM: α = min(1-1/(it+1), decay)
    teacher_scope: str = "all",  # 'all' EMAs params+BN; 'params' params only
    post_step: Callable | None = None,  # (cstate, aux, sample, svalid, ctx)
    weight_decay: float = 5e-4,
    donate: bool = True,
    mesh=None,  # Mesh with a 'client' axis: shard_map clients across devices
    augment_backend: str = "auto",  # 'auto'|'gather'|'paeth'|'pallas'|'normonly'
    augment_scale: int | None = None,  # K*B hint for the weak_strong fallback
    scan_unroll: int = 1,  # lax.scan unroll factor for the local-step loop
    weight_stream_dtype=None,  # cast f32 params once per step for compute
    hoist_augment: bool = False,  # batch the round's augmentation pre-scan
    # (measured NEGATIVE on the bench round, BENCH_NOTES — default off)
):
    """Build a jitted function running S local steps for ALL clients.

    ``loss_fn(params, rest, model, views, sample, svalid, ctx, cstate,
    rng, scalars) -> (loss, (new_rest, aux))`` operates on ONE client's
    batch; the engine vmaps it over the stacked client axis.

    * ``sample`` — dict of per-sample arrays gathered from [K, M, ...]
      tables ('labels' by convention; algorithms add masks).
    * ``views`` — 'x' (single) or 'x1'/'x2'; plus frozen-global logits
      'g_logits'/'g_logits1'/'g_logits2' when ``needs_global`` (reference
      stage-1 distillation, utils/local_training.py:943-947); plus teacher
      logits 't_logits' / 't_logits2' when a teacher is configured.
    * ``cstate`` — per-client persistent state (e.g. RoFL centroids),
      threaded through the scan and updated by ``post_step``.
    * ``aux`` — a pytree of per-step outputs, summed over steps and
      returned (FedIRM confusion matrices, CBAFed counters).

    The returned ``round_fn(state, data, plan, scalars)`` takes
      state = {'vars': stacked, ['teacher': stacked], ['cstate': pytree]}
      data  = {'ctx', 'global_vars'}
      plan  = {'images' [S,K,B,H,W,3], 'sample' {name: [S,K,B,...]},
               'pos' [S,K,B], 'pos_valid' [S,K,B], 'key', 'iter0'}
    and returns (state', mean_losses [K], aux_sum).

    Batch data arrives PRE-GATHERED (see ``gather_round_data``): a dataset
    gather inside the scan makes the TPU compiler pathologically slow
    (>20 min for one program vs <1 min without), so gathers run as their
    own tiny jitted program and the scan consumes dense xs tensors.
    """
    tx = torch_adam(lr, weight_decay)
    has_teacher = teacher_decay is not None

    augment_backend = resolve_augment_backend(augment_backend, view_mode,
                                              scale=augment_scale)
    weak = _pick_weak_backend(augment_backend)
    strong = _pick_strong_backend(augment_backend)

    def augment_views(imgs_u8, key):
        if view_mode == "single":
            k1, _ = jax.random.split(key)
            return {"x": weak(imgs_u8, k1, mean, std)}
        k1, k2 = jax.random.split(key)
        x1 = weak(imgs_u8, k1, mean, std)
        if view_mode == "dual":
            x2 = weak(imgs_u8, k2, mean, std)
        else:
            x2 = strong(imgs_u8, k2, mean, std)
        return {"x1": x1, "x2": x2}

    def client_step(vars_k, opt_k, teacher_k, cstate_k, imgs_u8, sample,
                    svalid, ctx, global_vars, key, it, scalars,
                    data_axis=None):
        if data_axis is not None:
            # distinct augmentation randomness per data shard
            key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
        ka, kl = jax.random.split(key)
        # xs may carry pre-augmented views (dict) when the round hoisted
        # augmentation out of the scan — see round_fn
        views = (dict(imgs_u8) if isinstance(imgs_u8, dict)
                 else augment_views(imgs_u8, ka))
        if needs_global:
            if view_mode == "single":
                _, glog = model.apply(global_vars, views["x"], train=False)
                views["g_logits"] = glog
            else:
                _, g1 = model.apply(global_vars, views["x1"], train=False)
                _, g2 = model.apply(global_vars, views["x2"], train=False)
                views["g_logits1"] = g1
                views["g_logits2"] = g2
        if has_teacher:
            tv = views["x"] if view_mode == "single" else views["x2"]
            _, tlog = model.apply(teacher_k, tv, train=False)
            views["t_logits2" if view_mode != "single" else "t_logits"] = tlog

        params = vars_k["params"]
        rest = {k: v for k, v in vars_k.items() if k != "params"}

        def lf(p):
            if weight_stream_dtype is not None:
                # cast the f32 master weights ONCE per step: every conv
                # fusion then streams bf16 weights to VMEM instead of f32
                # (profiling showed ~0.5 GB/step of f32 weight copies);
                # grads flow back through the cast to the f32 master
                p = jax.tree_util.tree_map(
                    lambda x: x.astype(weight_stream_dtype)
                    if x.dtype == jnp.float32 else x, p)
            return loss_fn(p, rest, model, views, sample, svalid, ctx,
                           cstate_k, kl, scalars)

        (loss, (new_rest, aux)), grads = jax.value_and_grad(lf, has_aux=True)(params)
        if data_axis is not None:
            # per-client data parallelism:each shard computed its loss over a
            # slice of the batch; average grads/loss, sync BN stats, sum aux
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)
            new_rest = jax.lax.pmean(new_rest, data_axis)
            aux = jax.tree_util.tree_map(
                lambda a: jax.lax.psum(a, data_axis), aux
            )
        updates, new_opt = tx.update(grads, opt_k, params)
        # a step with zero valid samples must be a TRUE no-op for this
        # client: params, BN running stats AND optimizer state all hold —
        # the reference's smaller clients simply run fewer steps
        # (reference: utils/local_training.py:920-923), so Adam moments
        # must not decay and its count must not increment on padding
        # steps. where() (not update*0) also keeps padded-out clients
        # NaN-safe under client-axis padding (see _pad_client_args).
        has_any = (svalid.sum() > 0).astype(jnp.float32)
        if data_axis is not None:
            has_any = jax.lax.pmax(has_any, data_axis)

        def keep(new, old):
            return jnp.where(has_any > 0, new, old)

        new_opt = jax.tree_util.tree_map(keep, new_opt, opt_k)
        new_rest = jax.tree_util.tree_map(keep, new_rest, rest)
        new_params = jax.tree_util.tree_map(
            keep, optax.apply_updates(params, updates), params)
        # padding steps contribute nothing to the round's aux sums either
        aux = jax.tree_util.tree_map(
            lambda a: jnp.where(has_any > 0, a, jnp.zeros_like(a)), aux)
        new_vars = dict(new_rest)
        new_vars["params"] = new_params

        new_teacher = teacher_k
        if has_teacher:
            alpha = jnp.float32(teacher_decay)
            if teacher_iter_corrected:
                alpha = jnp.minimum(1.0 - 1.0 / (it + 1.0), alpha)
            # skip EMA on padding steps too
            alpha = jnp.where(has_any > 0, alpha, 1.0)

            def ema(t, s):
                return alpha * t + (1.0 - alpha) * s.astype(t.dtype)

            if teacher_scope == "params":
                new_teacher = dict(teacher_k)
                new_teacher["params"] = jax.tree_util.tree_map(
                    ema, teacher_k["params"], new_params
                )
            else:
                new_teacher = jax.tree_util.tree_map(ema, teacher_k, new_vars)

        new_cstate = cstate_k
        if post_step is not None:
            new_cstate = post_step(cstate_k, aux, sample, svalid, ctx)
        return new_vars, new_opt, new_teacher, new_cstate, loss * has_any, has_any, aux

    # ------------------------------------------------------------------
    # One client's full local round: scan over its S steps. Weights stay
    # UNBATCHED here — a vmap over clients batches the conv kernels and
    # XLA lowers per-client-filter convolutions ~100x slower than plain
    # convs; clients are therefore iterated with lax.map (sequential on
    # one chip, sharded across chips via the client mesh axis).
    # ------------------------------------------------------------------

    def client_round(vars_k, teacher_k, cstate_k, opt_k, imgs_k, sample_k,
                     pos_k, valid_k, ctx_k, global_vars, key_k, it0, loss0,
                     cnt0, scalars, data_axis=None):
        def body(carry, xs):
            vars_k, opt_k, teacher_k, cstate_k, key, it, loss_sum, cnt, aux_sum = carry
            imgs, sample, step_pos, step_valid = xs  # [B, ...]
            key, sub = jax.random.split(key)
            sample = dict(sample)
            sample["_pos"] = step_pos  # table positions, for cstate scatters
            vars_k, opt_k, teacher_k, cstate_k, loss, has_any, aux = client_step(
                vars_k, opt_k, teacher_k, cstate_k, imgs, sample, step_valid,
                ctx_k, global_vars, sub, it, scalars, data_axis=data_axis,
            )
            if aux_sum is None:
                new_aux = aux
            else:
                new_aux = jax.tree_util.tree_map(jnp.add, aux_sum, aux)
            return (
                vars_k, opt_k, teacher_k, cstate_k, key, it + 1.0,
                loss_sum + loss, cnt + has_any, new_aux,
            ), None

        xs = (imgs_k, sample_k, pos_k, valid_k)  # leading axis S
        aux0 = jax.eval_shape(
            lambda: body(
                (vars_k, opt_k, teacher_k, cstate_k, key_k, it0,
                 loss0, cnt0, None),
                jax.tree_util.tree_map(lambda x: x[0], xs),
            )[0][8]
        )
        aux0 = jax.tree_util.tree_map(
            lambda sd: jnp.zeros(sd.shape, sd.dtype), aux0
        )
        init = (vars_k, opt_k, teacher_k, cstate_k, key_k, it0,
                loss0, cnt0, aux0)
        (vars_k, opt_k, teacher_k, cstate_k, key_k, it, loss_sum, cnt,
         aux_sum), _ = (
            jax.lax.scan(body, init, xs, unroll=scan_unroll)
        )
        mean_loss = loss_sum / jnp.maximum(cnt, 1.0)
        return (vars_k, teacher_k, cstate_k, opt_k, key_k, it, loss_sum,
                cnt, mean_loss, aux_sum)

    _CARRY_KEYS = {"opt", "keys", "it", "loss_sum", "cnt"}

    def round_fn(state, data, plan, scalars):
        pos, pos_valid = plan["pos"], plan["pos_valid"]  # [S, K, B]
        K = pos.shape[1]
        stacked_vars = state["vars"]
        teacher = state.get("teacher", {"params": jnp.zeros((K, 0))})
        cstate = state.get("cstate", jnp.zeros((K, 0)))
        ctx = data["ctx"]
        global_vars = data["global_vars"]
        carry_mode = "opt" in state
        if carry_mode:
            # windowed host-stream: per-client Adam/RNG/loss accumulators
            # arrive from the previous window (teacher/cstate already
            # thread via their own state entries; aux sums on the host)
            opt = state["opt"]
            keys = state["keys"]
            it0 = state["it"]
            loss0, cnt0 = state["loss_sum"], state["cnt"]
        else:
            opt = jax.vmap(tx.init)(stacked_vars["params"])
            keys = jax.random.split(plan["key"], K)
            it0 = jnp.full((K,), plan["iter0"], jnp.float32)
            loss0 = jnp.zeros((K,), jnp.float32)
            cnt0 = jnp.zeros((K,), jnp.float32)
        imgs = plan["images"]
        n_views = 1 if view_mode == "single" else 2
        # Hoist augmentation out of the scan when the round's view tensors
        # fit comfortably in HBM: ONE batched warp over all S·K·B images
        # replaces S·K in-scan calls (the warp's grid parallelism amortizes;
        # in-scan augmentation measured ~10% of the bench round). Disabled
        # under data-axis sharding (per-shard RNG folding happens in-step).
        hoist = (
            hoist_augment
            and not isinstance(imgs, dict)
            and imgs.ndim == 6
            and imgs.shape[0] * imgs.shape[1] * imgs.shape[2] * n_views
            <= 4096
            and (mesh is None or mesh.shape.get("data", 1) == 1)
        )
        if hoist:
            S_, K_, B_ = imgs.shape[:3]
            flat = imgs.reshape((S_ * K_ * B_,) + imgs.shape[3:])
            views_flat = augment_views(
                flat, jax.random.fold_in(plan["key"], 0x9A))
            imgs = {
                k: v.reshape((S_, K_, B_) + v.shape[1:])
                for k, v in views_flat.items()
            }
        # K-major views for the per-client map
        imgs_km = jax.tree_util.tree_map(
            lambda x: jnp.swapaxes(x, 0, 1), imgs)  # [K, S, B, ...]
        sample_km = jax.tree_util.tree_map(
            lambda x: jnp.swapaxes(x, 0, 1), plan["sample"]
        )
        pos_km = jnp.swapaxes(pos, 0, 1)
        valid_km = jnp.swapaxes(pos_valid, 0, 1)

        n_cl_shards = mesh.shape["client"] if mesh is not None else 1
        n_dp_shards = mesh.shape.get("data", 1) if mesh is not None else 1
        use_shard_map = (
            mesh is not None
            and (n_cl_shards > 1 or n_dp_shards > 1)
            and pos.shape[2] % n_dp_shards == 0
        )
        # non-divisible client counts shard via padding: no-op dummy
        # clients (valid=0 everywhere) fill the last shard and their rows
        # are sliced away below (SURVEY §2.9 — the client axis must not
        # silently evaporate at e.g. K=20 on an 8-device mesh)
        cl_pad = (
            padded_client_count(K, n_cl_shards) - K if use_shard_map else 0
        )
        if cl_pad:
            log.warning(
                "client axis padded %d -> %d to shard over %d devices "
                "(%d no-op dummy clients)",
                K, K + cl_pad, n_cl_shards, cl_pad,
            )
        data_axis = "data" if (use_shard_map and n_dp_shards > 1) else None
        if data_axis is not None and post_step is not None:
            raise NotImplementedError(
                "data-axis sharding with per-client state hooks is not "
                "supported (cstate would diverge across data shards)"
            )

        def make_map_clients(axis):
            def map_clients(stacked_args):
                def one(args):
                    vars_k, teacher_k, cstate_k, opt_k, imgs_k, sample_k, \
                        pos_k, valid_k, ctx_k, key_k, it0_k, loss0_k, \
                        cnt0_k = args
                    return client_round(
                        vars_k, teacher_k, cstate_k, opt_k, imgs_k, sample_k,
                        pos_k, valid_k, ctx_k, global_vars, key_k, it0_k,
                        loss0_k, cnt0_k, scalars, data_axis=axis,
                    )

                return jax.lax.map(one, stacked_args)

            return map_clients

        map_clients = make_map_clients(data_axis)

        stacked_args = (stacked_vars, teacher, cstate, opt, imgs_km,
                        sample_km, pos_km, valid_km, ctx, keys, it0, loss0,
                        cnt0)
        if cl_pad:
            # every arg here is client-major; valid_km pads with zeros so
            # the dummy clients never take a real step
            stacked_args = tuple(
                _pad_clients_tree(a, cl_pad, zero=(i == 7))
                for i, a in enumerate(stacked_args)
            )

        if use_shard_map:
            # each device loops over its LOCAL clients; lax.map over a
            # sharded axis would all-gather and serialize instead. Batch
            # tensors [K, S, B, ...] additionally split B over the 'data'
            # axis; grads/losses pmean inside client_step.
            from jax.sharding import PartitionSpec as P
            from jax.experimental.shard_map import shard_map

            # the batch-carrying tensors ([K, S, B, ...]) split B over the
            # 'data' axis; everything else (vars/teacher/cstate/opt/ctx/
            # keys and the windowed-carry accumulators) shards on 'client'
            def batch_spec(x):
                if data_axis is not None:
                    return P("client", None, "data")
                return P("client")

            vars_a, teacher_a, cstate_a, opt_a, imgs_a, sample_a, pos_a, \
                valid_a, ctx_a, keys_a, it_a, loss_a, cnt_a = stacked_args
            cl_only = lambda t: jax.tree_util.tree_map(
                lambda _: P("client"), t
            )
            spec = (
                cl_only(vars_a), cl_only(teacher_a), cl_only(cstate_a),
                cl_only(opt_a),
                jax.tree_util.tree_map(batch_spec, imgs_a),
                jax.tree_util.tree_map(batch_spec, sample_a),
                batch_spec(pos_a), batch_spec(valid_a),
                cl_only(ctx_a), P("client"), P("client"), P("client"),
                P("client"),
            )
            # trace the output STRUCTURE with the axis-free variant — the
            # collectives are unbound outside shard_map
            out_spec = jax.tree_util.tree_map(
                lambda _: P("client"),
                jax.eval_shape(make_map_clients(None), stacked_args),
            )
            mapped = shard_map(
                map_clients, mesh=mesh, in_specs=(spec,),
                out_specs=out_spec, check_rep=False,
            )
            outs = mapped(stacked_args)
            if cl_pad:
                outs = _slice_clients_tree(outs, K)
            svars, stea, scst, sopt, skeys, sit, sloss, scnt, mean_loss, \
                aux_sum = outs
        else:
            svars, stea, scst, sopt, skeys, sit, sloss, scnt, mean_loss, \
                aux_sum = map_clients(stacked_args)
        out_state = {"vars": svars}
        if "teacher" in state:
            out_state["teacher"] = stea
        if "cstate" in state:
            out_state["cstate"] = scst
        if carry_mode:
            out_state.update({"opt": sopt, "keys": skeys, "it": sit,
                              "loss_sum": sloss, "cnt": scnt})
        return out_state, mean_loss, aux_sum

    jitted = _round_jit(round_fn, donate)

    @jax.jit
    def init_carry(svars, key, iter0):
        """Windowed host-stream carry (see make_lockstep_local_round's
        init_carry): per-client Adam state, per-client RNG streams (the
        same split(key, K) the unwindowed round consumes) and loss
        accumulators. teacher/cstate thread through their regular state
        entries; per-step aux sums across windows on the host
        (train.py::Trainer._windowed_pass)."""
        K = jax.tree_util.tree_leaves(svars["params"])[0].shape[0]
        return {
            "opt": jax.vmap(tx.init)(svars["params"]),
            "keys": jax.random.split(key, K),
            "it": jnp.full((K,), iter0, jnp.float32),
            "loss_sum": jnp.zeros((K,), jnp.float32),
            "cnt": jnp.zeros((K,), jnp.float32),
        }

    def round_entry(state, data, plan, scalars):
        return jitted(state, data, plan, scalars)

    round_entry.init_carry = init_carry
    return round_entry

# ----------------------------------------------------------------------
# Channel-stacked lockstep round: all K clients advance through each local
# step as ONE wide network (models/stacked.py) instead of a lax.map of K
# small ones. Profiling showed the mapped path leaves the TPU's vector
# lanes/MXU contraction underfilled at batch 32 (BENCH_NOTES.md); stacking
# multiplies per-op width by K. Semantics match the mapped path exactly
# up to RNG stream assignment (tests/test_stacked_round.py).
# ----------------------------------------------------------------------


def make_stacked_local_round(
    model,
    stacked_loss_fn,
    *,
    lr: float,
    batch_size: int,
    mean,
    std,
    view_mode: str = "single",
    needs_global: bool = False,
    weight_decay: float = 5e-4,
    donate: bool = True,
    augment_backend: str = "auto",
    augment_scale: int | None = None,
    scan_unroll: int = 1,
    hoist_augment: bool = False,
):
    """Drop-in alternative to ``make_local_round`` (same round_fn signature)
    for algorithms providing a ``stacked_loss_fn``:

      stacked_loss_fn(params, rest, model, views, sample, svalid, ctx,
                      rng, scalars) -> (total_loss, (new_rest, loss_k [K]))

    where every tensor keeps its full [K, ...] client axis and params/rest
    are the stacked pytrees. The frozen-global forwards (``needs_global``)
    use identical weights for every client, so they run as ONE batched
    forward at K·B — a free K× batch amplification the mapped path
    cannot express."""
    tx = torch_adam(lr, weight_decay)

    augment_backend = resolve_augment_backend(augment_backend, view_mode,
                                              scale=augment_scale)
    weak = _pick_weak_backend(augment_backend)
    strong = _pick_strong_backend(augment_backend)

    def augment_views(imgs_u8, key):
        # one augmentation call over all K·B images
        K, B = imgs_u8.shape[:2]
        flat = imgs_u8.reshape((K * B,) + imgs_u8.shape[2:])

        def reshape(v):
            return v.reshape((K, B) + v.shape[1:])

        if view_mode == "single":
            k1, _ = jax.random.split(key)
            return {"x": reshape(weak(flat, k1, mean, std))}
        k1, k2 = jax.random.split(key)
        x1 = reshape(weak(flat, k1, mean, std))
        if view_mode == "dual":
            x2 = reshape(weak(flat, k2, mean, std))
        else:
            x2 = reshape(strong(flat, k2, mean, std))
        return {"x1": x1, "x2": x2}

    def global_logits(global_vars, views):
        # identical weights across clients → one K·B-batch forward per view
        def fwd(v):
            K, B = v.shape[:2]
            _, logits = model.apply(
                global_vars, v.reshape((K * B,) + v.shape[2:]), train=False)
            return logits.reshape(K, B, -1)

        if view_mode == "single":
            views["g_logits"] = fwd(views["x"])
        else:
            views["g_logits1"] = fwd(views["x1"])
            views["g_logits2"] = fwd(views["x2"])
        return views

    def round_fn(state, data, plan, scalars):
        pos, pos_valid = plan["pos"], plan["pos_valid"]  # [S, K, B]
        K = pos.shape[1]
        svars = state["vars"]
        ctx = data["ctx"]
        global_vars = data["global_vars"]
        # per-client optimizer state (vmapped init/update): Adam is pure
        # elementwise math so this is bitwise-identical to a shared-tree
        # update for clients that run every step, but it gives each client
        # its own step count so padding steps can hold its state exactly
        opt0 = jax.vmap(tx.init)(svars["params"])

        imgs_all = plan["images"]
        n_views = 1 if view_mode == "single" else 2
        if (hoist_augment and not isinstance(imgs_all, dict)
                and imgs_all.ndim == 6
                and imgs_all.shape[0] * imgs_all.shape[1] * imgs_all.shape[2]
                * n_views <= 4096):
            # one batched warp over all S*K*B round images (see
            # make_local_round's hoist note)
            S_, K_, B_ = imgs_all.shape[:3]
            flat = imgs_all.reshape((S_ * K_ * B_,) + imgs_all.shape[3:])
            kh = jax.random.fold_in(plan["key"], 0x9A)
            if view_mode == "single":
                k1, _ = jax.random.split(kh)
                vf = {"x": weak(flat, k1, mean, std)}
            else:
                k1, k2 = jax.random.split(kh)
                x1 = weak(flat, k1, mean, std)
                x2 = (weak(flat, k2, mean, std) if view_mode == "dual"
                      else strong(flat, k2, mean, std))
                vf = {"x1": x1, "x2": x2}
            imgs_all = {
                k: v.reshape((S_, K_, B_) + v.shape[1:])
                for k, v in vf.items()
            }

        def body(carry, xs):
            vars_s, opt, key, loss_sum, cnt = carry
            imgs, sample, step_pos, svalid = xs  # [K, B, ...]
            key, sub = jax.random.split(key)
            ka, kl = jax.random.split(sub)
            views = (dict(imgs) if isinstance(imgs, dict)
                     else augment_views(imgs, ka))
            if needs_global:
                views = global_logits(global_vars, views)
            sample = dict(sample)
            sample["_pos"] = step_pos
            params = vars_s["params"]
            rest = {k: v for k, v in vars_s.items() if k != "params"}

            def lf(p):
                return stacked_loss_fn(p, rest, model, views, sample,
                                       svalid, ctx, kl, scalars)

            (_, (new_rest, loss_k)), grads = jax.value_and_grad(
                lf, has_aux=True)(params)
            updates, new_opt = jax.vmap(tx.update)(grads, opt, params)
            has_any = (svalid.sum(1) > 0).astype(jnp.float32)  # [K]

            # zero-valid (padding) steps are TRUE no-ops per client: params,
            # BN stats and Adam state all hold (reference clients just run
            # fewer steps, utils/local_training.py:920-923)
            def keep(new, old):
                m = has_any.reshape((K,) + (1,) * (new.ndim - 1))
                return jnp.where(m > 0, new, old)

            new_opt = jax.tree_util.tree_map(keep, new_opt, opt)
            new_rest = jax.tree_util.tree_map(keep, new_rest, rest)
            new_params = jax.tree_util.tree_map(
                keep, optax.apply_updates(params, updates), params)
            new_vars = dict(new_rest)
            new_vars["params"] = new_params
            return (new_vars, new_opt, key, loss_sum + loss_k * has_any,
                    cnt + has_any), None

        init = (svars, opt0, plan["key"], jnp.zeros((K,), jnp.float32),
                jnp.zeros((K,), jnp.float32))
        xs = (imgs_all, plan["sample"], pos, pos_valid)
        (svars, _, _, loss_sum, cnt), _ = jax.lax.scan(
            body, init, xs, unroll=scan_unroll)
        mean_loss = loss_sum / jnp.maximum(cnt, 1.0)
        return {"vars": svars}, mean_loss, {}

    return _round_jit(round_fn, donate)


# ----------------------------------------------------------------------
# Lockstep mapped round: scan over the S local steps OUTSIDE, lax.map over
# the K clients INSIDE each step. Training math is identical to
# make_local_round (plain per-client flax applies — no stacked BN), but the
# loop order lets the per-step shared work batch across clients:
#   * ONE augmentation call over K·B images instead of K calls at B;
#   * the frozen-global forwards (identical weights for every client —
#     FedMLP stage-1 runs two per step, reference
#     utils/local_training.py:943-947) run ONCE at batch K·B instead of
#     K times at batch B, K-filling the MXU for the flagship's dominant
#     non-gradient compute.
# RNG stream differs from the mapped engine (one step key → per-client
# split, vs per-client keys split per step); semantics are otherwise
# identical (tests/test_lockstep_round.py).
# ----------------------------------------------------------------------


def make_lockstep_local_round(
    model,
    loss_fn: LossFn,
    *,
    lr: float,
    batch_size: int,
    mean,
    std,
    view_mode: str = "dual",
    needs_global: bool = True,
    weight_decay: float = 5e-4,
    donate: bool = True,
    mesh=None,  # Mesh with a 'client' axis (data axis must be 1)
    augment_backend: str = "auto",
    augment_scale: int | None = None,
    scan_unroll: int = 1,
    client_unroll: bool = False,
    view_precat: bool = False,
    small_pack: int = 0,
):
    """Drop-in alternative to ``make_local_round`` for algorithms without
    teacher/cstate/post_step hooks (FedMLP stage-1/stage-2, FedNoRo).
    Same ``round_fn(state, data, plan, scalars)`` signature; ``state`` must
    contain only ``vars``.

    ``client_unroll`` replaces the per-step lax.map over clients with a
    Python loop of static-index slices: the map's dynamic-slice /
    dynamic-update-slice machinery (~62k tiny ops per flagship round,
    round-3 profile) disappears at the cost of a K×-larger step program
    (compile-time experiment knob).

    ``view_precat`` (set by the trainer when the algorithm's viewcat loss
    is active): concatenate the two weak views ONCE per step at
    [Kl, 2B, ...] in the step body instead of per-client inside the
    lax.map — the round-4 stage-1 trace showed each client's in-map
    ``jnp.concatenate`` lowering to a 38.5 MB layout-conversion copy
    ({2,1,3,0} → batch-minor {0,3,2,1}, 1.45 ms/step across K=20). Same
    concat order ⇒ bitwise-identical math
    (tests/test_lockstep_round.py::test_view_precat_bitwise). Measured
    NEUTRAL on the flagship (the conversion moves to the step-level
    concat rather than disappearing) — default off, tested knob.

    ``small_pack`` (elements, 0 = off): inside the per-client map, ravel
    every f32 leaf of (grads, new_rest) with <= small_pack elements into
    ONE flat vector and slice it back apart outside the map. The map's
    stacked output then has one [Kl, n] buffer where it had ~250 tiny
    ones (BN scale/bias grads + running stats) — each of which is a
    separate dynamic-update-slice stream paying DMA latency per client
    per step (round-4 trace: ~15.6 ms/step of tiny copy-done).
    Reshape/concat/slice only ⇒ bit-identical
    (tests/test_lockstep_round.py::test_small_pack_bitwise)."""
    tx = torch_adam(lr, weight_decay)

    augment_backend = resolve_augment_backend(augment_backend, view_mode,
                                              scale=augment_scale)
    weak = _pick_weak_backend(augment_backend)
    strong = _pick_strong_backend(augment_backend)

    def _per_image_keys(ka_s, view_idx, n_per, B):
        """Shard-invariant per-image augmentation keys: client k's view-v
        image keys derive from fold_in(ka_k, v) alone, so a client shard
        computes exactly the keys the unsharded round would."""
        def one(ka_k):
            kv = jax.random.fold_in(ka_k, view_idx)
            return jax.random.split(kv, n_per * B).reshape(B, n_per, 2)

        keys = jax.vmap(one)(ka_s)  # [Kl, B, n_per, 2]
        return keys.reshape((-1, n_per, 2))

    def augment_flat(flat_u8, ka_s, B):
        """One augmentation call over all Kl·B step images, with per-image
        keys derived per (client, view) — see _per_image_keys."""
        dummy = ka_s[0]
        if view_mode == "single":
            k1 = _per_image_keys(ka_s, 0, 2, B)
            return {"x": weak(flat_u8, dummy, mean, std, keys=k1)}
        k1 = _per_image_keys(ka_s, 0, 2, B)
        x1 = weak(flat_u8, dummy, mean, std, keys=k1)
        if view_mode == "dual":
            k2 = _per_image_keys(ka_s, 1, 2, B)
            x2 = weak(flat_u8, dummy, mean, std, keys=k2)
        else:
            k2 = _per_image_keys(ka_s, 1, 3, B)
            x2 = strong(flat_u8, dummy, mean, std, keys=k2)
        return {"x1": x1, "x2": x2}

    _CARRY_KEYS = {"vars", "opt", "keys", "it", "loss_sum", "cnt"}

    def fold_client_keys(key, K):
        """Round key → per-client key streams [K, 2] (global client ids)."""
        return jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(K))

    def round_fn(state, data, plan, scalars):
        carry_mode = "opt" in state
        assert set(state) == ({"vars"} if not carry_mode else _CARRY_KEYS), (
            "lockstep round supports plain-vars algorithms only (plus the "
            "windowed-stream carry: opt/keys/it/loss_sum/cnt)"
        )
        pos, pos_valid = plan["pos"], plan["pos_valid"]  # [S, K, B]
        K = pos.shape[1]
        svars = state["vars"]
        ctx = data["ctx"]
        global_vars = data["global_vars"]
        imgs_all = plan["images"]
        assert not isinstance(imgs_all, dict), (
            "lockstep round augments in-step; pre-augmented views unsupported"
        )

        n_cl_shards = mesh.shape["client"] if mesh is not None else 1
        use_shard_map = (
            mesh is not None and n_cl_shards > 1
            and mesh.shape.get("data", 1) == 1
        )
        # non-divisible K shards via no-op dummy-client padding (valid=0
        # rows, sliced away after the round) — see make_local_round
        cl_pad = (
            padded_client_count(K, n_cl_shards) - K if use_shard_map else 0
        )
        if cl_pad:
            log.warning(
                "client axis padded %d -> %d to shard over %d devices "
                "(%d no-op dummy clients)",
                K, K + cl_pad, n_cl_shards, cl_pad,
            )

        if carry_mode:
            opt0, keys0 = state["opt"], state["keys"]
            it0, loss0, cnt0 = state["it"], state["loss_sum"], state["cnt"]
        else:
            opt0 = jax.vmap(tx.init)(svars["params"])
            keys0 = fold_client_keys(plan["key"], K)
            it0 = jnp.full((K,), plan["iter0"], jnp.float32)
            loss0 = jnp.zeros((K,), jnp.float32)
            cnt0 = jnp.zeros((K,), jnp.float32)

        def scan_round(svars, imgs_all, sample_all, pos, pos_valid,
                       ctx, opt0, keys0, it0, loss0, cnt0):
            Kl = pos.shape[1]  # local client count (K / shards under mesh)

            def body(carry, xs):
                vars_s, opt_s, keys_s, it, loss_sum, cnt = carry
                imgs_s, sample_s, pos_s, valid_s = xs  # [Kl, B, ...]
                # per-client key evolution: split each client's stream —
                # identical under any client sharding (no axis_index)
                nxt = jax.vmap(jax.random.split)(keys_s)  # [Kl, 2, 2]
                keys_next, subs = nxt[:, 0], nxt[:, 1]
                sub2 = jax.vmap(jax.random.split)(subs)
                ka_s, kl_s = sub2[:, 0], sub2[:, 1]  # [Kl, 2] each
                B = imgs_s.shape[1]
                flat = imgs_s.reshape((Kl * B,) + imgs_s.shape[2:])
                views_flat = augment_flat(flat, ka_s, B)
                if needs_global:
                    # ONE frozen-global forward per view at batch Kl·B
                    for name, v in list(views_flat.items()):
                        _, glog = model.apply(global_vars, v, train=False)
                        suffix = name[1:] if name != "x" else ""
                        views_flat[f"g_logits{suffix}"] = glog
                views_k = {
                    k: v.reshape((Kl, B) + v.shape[1:])
                    for k, v in views_flat.items()
                }
                if view_precat and "x1" in views_k and "x2" in views_k:
                    # one step-level concat; the map slices [2B, ...] per
                    # client (see view_precat in the factory docstring)
                    views_k["x12"] = jnp.concatenate(
                        [views_k.pop("x1"), views_k.pop("x2")], axis=1)
                sample_s = dict(sample_s)
                sample_s["_pos"] = pos_s

                # small_pack spec: filled at trace time of `one` (lax.map
                # traces the body synchronously, so the cell is populated
                # by the time the stacked outputs are unpacked below)
                pack_spec = {}

                def one(args):
                    # gradient only — the conv-heavy part that must stay
                    # per-client (vmapped per-client-filter convs lower
                    # ~100x slower); the Adam update is pure elementwise
                    # math and runs K-BATCHED outside the map, which keeps
                    # the optimizer state out of the map's slice/update
                    # machinery entirely (profiling showed ~60k tiny ops
                    # per step from per-client per-leaf optimizer chains)
                    vars_k, views_kk, sample_k, svalid_k, ctx_k, kl = args
                    params = vars_k["params"]
                    rest = {k: v for k, v in vars_k.items() if k != "params"}

                    def lf(p):
                        return loss_fn(p, rest, model, views_kk, sample_k,
                                       svalid_k, ctx_k, jnp.zeros((0,)), kl,
                                       scalars)

                    (loss, (new_rest, _aux)), grads = jax.value_and_grad(
                        lf, has_aux=True)(params)
                    if not small_pack:
                        return grads, new_rest, loss
                    leaves, treedef = jax.tree_util.tree_flatten(
                        (grads, new_rest))
                    small = frozenset(
                        i for i, l in enumerate(leaves)
                        if l.size <= small_pack and l.dtype == jnp.float32)
                    pack_spec["treedef"] = treedef
                    pack_spec["small"] = small
                    pack_spec["shapes"] = [l.shape for l in leaves]
                    big = tuple(l for i, l in enumerate(leaves)
                                if i not in small)
                    flat = (jnp.concatenate(
                        [leaves[i].reshape(-1) for i in sorted(small)])
                        if small else jnp.zeros((1,), jnp.float32))
                    return big, flat, loss

                map_args = (vars_s, views_k, sample_s, valid_s, ctx, kl_s)
                if client_unroll:
                    outs = [
                        one(jax.tree_util.tree_map(lambda x: x[k], map_args))
                        for k in range(Kl)
                    ]
                    mapped = jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs), *outs
                    )
                else:
                    mapped = jax.lax.map(one, map_args)
                if small_pack:
                    big_t, flat_t, loss = mapped
                    small, shapes = pack_spec["small"], pack_spec["shapes"]
                    leaves_out, bi, off = [], 0, 0
                    for i, shp in enumerate(shapes):
                        if i in small:
                            sz = 1
                            for d in shp:
                                sz *= d
                            leaves_out.append(
                                flat_t[:, off:off + sz].reshape((Kl,) + shp))
                            off += sz
                        else:
                            leaves_out.append(big_t[bi])
                            bi += 1
                    grads, new_rest = jax.tree_util.tree_unflatten(
                        pack_spec["treedef"], leaves_out)
                else:
                    grads, new_rest, loss = mapped
                has_any = (valid_s.sum(1) > 0).astype(jnp.float32)  # [Kl]
                params_s = vars_s["params"]
                updates, new_opt = jax.vmap(tx.update)(grads, opt_s, params_s)

                # zero-valid (padding) steps are TRUE no-ops per client:
                # params, BN stats and Adam state all hold (reference
                # clients just run fewer steps, local_training.py:920-923)
                def keep(new, old):
                    m = has_any.reshape((Kl,) + (1,) * (new.ndim - 1))
                    return jnp.where(m > 0, new, old)

                opt_s = jax.tree_util.tree_map(keep, new_opt, opt_s)
                rest_old = {k: v for k, v in vars_s.items() if k != "params"}
                new_rest = jax.tree_util.tree_map(keep, new_rest, rest_old)
                new_params = jax.tree_util.tree_map(
                    keep, optax.apply_updates(params_s, updates), params_s)
                vars_s = dict(new_rest)
                vars_s["params"] = new_params
                return (vars_s, opt_s, keys_next, it + 1.0,
                        loss_sum + loss * has_any, cnt + has_any), None

            init = (svars, opt0, keys0, it0, loss0, cnt0)
            xs = (imgs_all, sample_all, pos, pos_valid)
            (svars, opt, keys, it, loss_sum, cnt), _ = jax.lax.scan(
                body, init, xs, unroll=scan_unroll)
            mean_loss = loss_sum / jnp.maximum(cnt, 1.0)
            return svars, mean_loss, opt, keys, it, loss_sum, cnt

        args = (svars, imgs_all, plan["sample"], pos, pos_valid, ctx,
                opt0, keys0, it0, loss0, cnt0)
        if cl_pad:
            # args 1-4 are step-major [S, K, ...] (client axis 1); the rest
            # are client-major; pos_valid (index 4) pads with zeros so the
            # dummy clients never take a real step
            args = tuple(
                _pad_clients_tree(a, cl_pad, axis=1 if 1 <= i <= 4 else 0,
                                  zero=(i == 4))
                for i, a in enumerate(args)
            )
        if use_shard_map:
            # every argument (including the carry) is client-major, so the
            # windowed-stream carry threads through shard_map unchanged —
            # windowed+sharded == unwindowed+unsharded exactly
            # (tests/test_stream_window.py::test_windowed_sharded)
            from jax.sharding import PartitionSpec as P
            from jax.experimental.shard_map import shard_map

            cl = lambda t: jax.tree_util.tree_map(lambda _: P("client"), t)
            step_cl = lambda t: jax.tree_util.tree_map(
                lambda _: P(None, "client"), t)  # [S, K, ...] tensors
            spec = (cl(svars), step_cl(imgs_all),
                    step_cl(plan["sample"]), P(None, "client"),
                    P(None, "client"), cl(ctx),
                    cl(opt0), P("client"), P("client"), P("client"),
                    P("client"))
            out_spec = (cl(svars), P("client"), cl(opt0), P("client"),
                        P("client"), P("client"), P("client"))
            outs = shard_map(
                scan_round, mesh=mesh, in_specs=spec, out_specs=out_spec,
                check_rep=False,
            )(*args)
            if cl_pad:
                outs = _slice_clients_tree(outs, K)
            svars, mean_loss, opt, keys, it, loss_sum, cnt = outs
        else:
            svars, mean_loss, opt, keys, it, loss_sum, cnt = scan_round(*args)
        if carry_mode:
            out = {"vars": svars, "opt": opt, "keys": keys, "it": it,
                   "loss_sum": loss_sum, "cnt": cnt}
            return out, mean_loss, {}
        return {"vars": svars}, mean_loss, {}

    jitted = _round_jit(round_fn, donate)

    @jax.jit
    def init_carry(svars, key, iter0):
        """Windowed host-stream carry: per-client Adam state + per-client
        RNG key streams + loss accumulators, so round_fn can consume the
        round's S steps in W-step windows (only one window's images
        resident in HBM) and compose to exactly the unwindowed round —
        Adam moments, RNG streams and loss means all thread through the
        carry. All leaves are client-major, so the carry also shards over
        the client mesh axis."""
        K = jax.tree_util.tree_leaves(svars["params"])[0].shape[0]
        return {
            "opt": jax.vmap(tx.init)(svars["params"]),
            "keys": fold_client_keys(key, K),
            "it": jnp.full((K,), iter0, jnp.float32),
            "loss_sum": jnp.zeros((K,), jnp.float32),
            "cnt": jnp.zeros((K,), jnp.float32),
        }

    def round_entry(state, data, plan, scalars):
        return jitted(state, data, plan, scalars)

    round_entry.init_carry = init_carry
    return round_entry


# ----------------------------------------------------------------------
# Full-dataset harvest: per-client features + probs over the padded table
# (FedMLP prototype/τ extraction passes, reference:
#  utils/local_training.py:971-1002, 1023-1049, 1208-1250 — the reference
#  re-walks its DataLoader; here it is one scanned, vmapped forward)
# ----------------------------------------------------------------------

def make_harvest_fn(model, mean, std, batch_size: int,
                    augment_weak: bool = True, mesh=None,
                    augment_backend: str = "auto"):
    """Build jit fn: (stacked_vars, images, idx[K,M], key) →
    (features [K, M, D], probs [K, M, C]).

    ``augment_weak`` matches the reference's use of the image_aug_1 weak
    view for prototype extraction (utils/local_training.py:982).

    ``mesh`` (a Mesh with a 'client' axis) shards the per-client forward
    sweep: each device scans its LOCAL clients' chunks under shard_map —
    a bare lax.map over a client-sharded axis would all-gather and
    serialize the extraction passes (the FedMLP stage transitions,
    reference utils/local_training.py:971-1002/1023-1049, would otherwise
    defeat client parallelism every round)."""

    augment_backend = resolve_augment_backend(augment_backend, "single")
    weak = _pick_weak_backend(augment_backend)

    def one_batch(vars_k, imgs_u8, key):
        if augment_weak:
            # Pallas warp on TPU — the gather warp is ~5x slower there and
            # a stage-2 round harvests the FULL local dataset twice
            # (reference :1023-1049, :1208-1250)
            x = weak(imgs_u8, key, mean, std)
        else:
            x = A.eval_batch(imgs_u8, mean, std)
        feature, logits = model.apply(vars_k, x, train=False)
        return feature, jax.nn.sigmoid(logits)

    @jax.jit
    def gather_chunks(images, idx):
        K, M = idx.shape
        nb = (M + batch_size - 1) // batch_size
        pad = nb * batch_size - M
        idx_p = jnp.pad(idx, ((0, 0), (0, pad)), mode="edge")
        gidx = idx_p.reshape(K, nb, batch_size)
        return images[gidx]  # [K, nb, B, H, W, 3]

    def one_client(args):
        vars_k, chunks_k, key_k = args

        def body(key, imgs):
            key, sub = jax.random.split(key)
            f, p = one_batch(vars_k, imgs, sub)
            return key, (f, p)

        _, (feats, probs) = jax.lax.scan(body, key_k, chunks_k)
        return feats, probs  # [nb, B, D], [nb, B, C]

    @jax.jit
    def forward_chunks(stacked_vars, chunks, key):
        # lax.map over clients (unbatched weights — see make_local_round)
        K = chunks.shape[0]
        keys = jax.random.split(key, K)
        feats, probs = jax.lax.map(one_client, (stacked_vars, chunks, keys))
        return feats, probs  # [K, nb, B, ...]

    @jax.jit
    def forward_chunks_sharded(stacked_vars, chunks, key):
        # shard_map over the client axis: each device scans its local
        # clients; no collective needed (outputs stay client-sharded)
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        K = chunks.shape[0]
        keys = jax.random.split(key, K)
        cl = lambda t: jax.tree_util.tree_map(lambda _: P("client"), t)

        def local(sv, ch, ks):
            return jax.lax.map(one_client, (sv, ch, ks))

        return shard_map(
            local, mesh=mesh,
            in_specs=(cl(stacked_vars), P("client"), P("client")),
            out_specs=(P("client"), P("client")), check_rep=False,
        )(stacked_vars, chunks, keys)

    @jax.jit
    def forward_one_chunk(stacked_vars, chunk_imgs, key):
        # chunk_imgs [K, B, ...]; lax.map over clients (unbatched weights)
        K = chunk_imgs.shape[0]
        keys = jax.random.split(key, K)

        def one(args):
            vars_k, imgs_k, key_k = args
            return one_batch(vars_k, imgs_k, key_k)

        return jax.lax.map(one, (stacked_vars, chunk_imgs, keys))

    def harvest(stacked_vars, images, idx, key, loader=None):
        """``images`` may be None when a host ``loader`` streams the packed
        shard from disk (cfg.data.host_stream): chunks are gathered by the
        native threaded loader with double-buffered prefetch (pl_submit/
        pl_wait) so the next chunk's disk gather overlaps this chunk's
        device forward — the dataset never materializes in HBM."""
        K, M = idx.shape
        nb = (M + batch_size - 1) // batch_size
        use_mesh = (
            mesh is not None and mesh.shape.get("client", 1) > 1
        )
        if images is not None:
            chunks = gather_chunks(images, idx)
            if use_mesh and K % mesh.shape["client"]:
                # pad the client axis with edge rows so the extraction
                # sweep shards at non-divisible K; padded rows sliced away
                pad = padded_client_count(K, mesh.shape["client"]) - K
                feats, probs = forward_chunks_sharded(
                    _pad_clients_tree(stacked_vars, pad),
                    _pad_clients_tree(chunks, pad), key)
                feats, probs = feats[:K], probs[:K]
            else:
                fwd_fn = forward_chunks_sharded if use_mesh else forward_chunks
                feats, probs = fwd_fn(stacked_vars, chunks, key)
        else:
            assert loader is not None, "host-stream harvest needs a loader"
            idx_np = np.asarray(idx)
            pad = nb * batch_size - M
            idx_p = np.pad(idx_np, ((0, 0), (0, pad)), mode="edge")
            gidx = idx_p.reshape(K, nb, batch_size).astype(np.int64)
            feats_l, probs_l = [], []
            loader.submit(gidx[:, 0])
            for j in range(nb):
                chunk = loader.wait()
                if j + 1 < nb:
                    loader.submit(gidx[:, j + 1])  # prefetch next chunk
                chunk_j = jnp.asarray(chunk)
                if getattr(loader, "reuse", False):
                    # reused host buffer: transfer must land before the
                    # next wait() overwrites it
                    chunk_j.block_until_ready()
                f, p = forward_one_chunk(
                    stacked_vars, chunk_j,
                    jax.random.fold_in(key, j),
                )
                feats_l.append(f)
                probs_l.append(p)
            feats = jnp.stack(feats_l, axis=1)  # [K, nb, B, D]
            probs = jnp.stack(probs_l, axis=1)
        feats = feats.reshape(K, nb * batch_size, -1)[:, :M]
        probs = probs.reshape(K, nb * batch_size, -1)[:, :M]
        return feats, probs

    return harvest


# ----------------------------------------------------------------------
# Evaluation forward (batched, device-side)
# ----------------------------------------------------------------------

def make_eval_fn(model, mean, std, batch_size: int = 128):
    @jax.jit
    def fwd(global_vars, imgs_u8):
        x = A.eval_batch(imgs_u8, mean, std)
        feat, logits = model.apply(global_vars, x, train=False)
        return feat, jax.nn.sigmoid(logits)

    def evaluate_probs(global_vars, images_u8):
        """Streamed evaluation: ``images_u8`` may be a host numpy array or
        an np.memmap of the packed test shard — only one chunk is resident
        in HBM at a time (the full ICH test set is ~8 GB, reference scale:
        utils/evaluations.py:15-33). Chunk k+1's host slice/transfer
        overlaps chunk k's device compute because ``fwd`` dispatches
        asynchronously; only the tiny [N, C] probs sync at the end."""
        n = images_u8.shape[0]
        on_host = isinstance(images_u8, np.ndarray)
        out = []
        for s in range(0, n, batch_size):
            chunk = images_u8[s : s + batch_size]
            pad = batch_size - chunk.shape[0]
            if pad:
                zeros = (np if on_host else jnp).zeros(
                    (pad,) + chunk.shape[1:], chunk.dtype
                )
                chunk = (np if on_host else jnp).concatenate([chunk, zeros])
            _, probs = fwd(global_vars, chunk)
            out.append(probs[: batch_size - pad if pad else batch_size])
        return np.concatenate([np.asarray(p) for p in out], axis=0)

    return evaluate_probs
