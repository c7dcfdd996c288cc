"""The training engine: ONE compiled train step for every CL method.

The reference implements eleven separate PyTorch epoch loops with custom SGD
subclasses that inject each method's regularizer into ``optimizer.step``
(ref:SURVEY §2.3). Here there is a single engine:

- the epoch is a ``lax.scan`` over batches inside one ``jax.jit`` — weights,
  momentum, method state and metrics never leave the device during an epoch;
- batches are gathered on-device from the task's resident uint8 dataset and
  sharded over the data mesh axis (``parallel/mesh.py``); XLA GSPMD inserts
  the gradient/metric psums on ICI;
- method mechanics plug in via ``UpdateRule`` pure functions
  (``methods/base.py``) evaluated inside the same compiled step, reproducing
  the reference's "regularizer inside optimizer.step" order exactly:
  CE-grads (+ distillation terms) -> + penalty grads -> masking/projection ->
  + weight decay -> momentum -> masked update
  (ref:src/methods/EWC/train_EWC.py:23-86);
- the SGD hyper-behavior matches the reference's shared protocol: momentum
  0.9, lr x0.1 after 5 non-improving val epochs, early stop after 10
  (ref:src/methods/Finetune/train_SGD.py:10-30), best-val model checkpointing
  and epoch-granular resume (ref:src/methods/Finetune/train_SGD.py:41-189).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from clsurvey_tpu.methods.base import UpdateRule
from clsurvey_tpu.models import heads as heads_lib
from clsurvey_tpu.models.registry import ModelSpec
from clsurvey_tpu.ops import preprocess as pp
from clsurvey_tpu.parallel import mesh as mesh_lib
from clsurvey_tpu.utils import io
from clsurvey_tpu.utils import rowgather
from clsurvey_tpu.utils.paths import (
    BEST_MODEL_FILENAME, EPOCH_CKPT_FILENAME)

# Epochs ending above this train loss are treated as divergence (like NaN):
# healthy losses are O(ln n_classes + reg terms) — orders of magnitude
# below — while a finite-but-exploded epoch is just the step before the
# NaN and must never be recorded as a best model.
# Finite-divergence containment bound (see the abort in train_task):
# overridable for controlled A/Bs — CLSURVEY_DIVERGENCE_BOUND=inf restores
# the r1 NaN-only abort behavior (used to attribute the SI demo-table
# change between r1 and the r3 refresh, docs/survey_demo_notes.md).
DIVERGENCE_LOSS_BOUND = float(
    os.environ.get("CLSURVEY_DIVERGENCE_BOUND", "1e6"))


@flax.struct.dataclass
class TrainState:
    trainable: Any      # {'params': backbone, 'heads': {'kernel','bias'}}
    batch_stats: Any
    momentum: Any       # like trainable
    mstate: Any         # method state (hyper scalars + importance tensors...)


@dataclass
class EngineContext:
    """Static description of one task-training problem."""

    spec: ModelSpec
    backbone: Any
    task: int                     # 0-based head index of the current task
    n_tasks: int                  # heads active (incl. current)
    class_counts: np.ndarray      # (max_tasks,) real class counts
    mean: tuple
    std: tuple
    update_rule: UpdateRule
    augment: bool = True
    momentum: float = 0.9
    weight_decay: float = 0.0
    freeze_backbone: bool = False  # head-only training (LwF warmup,
    # ref:src/methods/Finetune/main_SGD.py:72 freeze_mode)
    # L1 weight decay: decay term wd*sign(theta) instead of wd*theta
    # (MAS extra, ref:src/methods/MAS/train_MAS.py:72-76 L1_decay flag)
    l1_decay: bool = False
    mesh: Any = None
    # None -> resolved in make_context: Pallas fused u8->norm on TPU,
    # jnp (XLA-fused) elsewhere. Override with CLSURVEY_PALLAS_PREPROCESS=0/1.
    use_pallas_preprocess: bool = False

    def bank(self, trainable: Any) -> dict:
        return {"kernel": trainable["heads"]["kernel"],
                "bias": trainable["heads"]["bias"],
                "class_counts": self.class_counts}

    def forward_feats(self, params, batch_stats, x, train: bool,
                      rng: jax.Array):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        rngs = {"dropout": rng} if (train and self.spec.uses_dropout) else None
        if train and self.spec.has_batch_stats:
            feats, mut = self.backbone.apply(
                variables, x, train=True, rngs=rngs, mutable=["batch_stats"])
            return feats, mut.get("batch_stats", batch_stats)
        feats = self.backbone.apply(variables, x, train=train, rngs=rngs)
        return feats, batch_stats

    def task_logits(self, trainable, feats):
        return heads_lib.forward(self.bank(trainable), feats, self.task)

    def all_logits(self, trainable, feats):
        return heads_lib.forward_all(self.bank(trainable), feats, self.n_tasks)

    def shared_logits(self, trainable, feats):
        return heads_lib.shared_logits(self.bank(trainable), feats,
                                       self.n_tasks)

    def preprocess(self, rng, images_u8):
        fn = pp.preprocess_pallas if self.use_pallas_preprocess \
            else pp.preprocess
        x = fn(rng, images_u8, self.mean, self.std, self.augment,
               dtype=self.spec.compute_dtype)
        if self.mesh is not None:
            x = mesh_lib.constrain_batch(x, self.mesh)
        return x


def _default_pallas_preprocess() -> bool:
    env = os.environ.get("CLSURVEY_PALLAS_PREPROCESS")
    if env is not None:
        return env.strip().lower() not in ("0", "false", "no", "off", "")
    return jax.default_backend() not in ("cpu",)


def make_context(spec: ModelSpec, task: int, n_tasks: int,
                 class_counts, mean, std, update_rule: UpdateRule,
                 **kwargs) -> EngineContext:
    kwargs.setdefault("use_pallas_preprocess", _default_pallas_preprocess())
    return EngineContext(
        spec=spec, backbone=spec.make_backbone(), task=task, n_tasks=n_tasks,
        class_counts=np.asarray(class_counts, np.int32), mean=tuple(mean),
        std=tuple(std), update_rule=update_rule,
        mesh=kwargs.pop("mesh", mesh_lib.get_mesh()), **kwargs)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def gather_rows_u8(images: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batch row gather from the resident uint8 dataset.

    Native ``jnp.take`` measures within ~5% of a contiguous
    ``dynamic_slice`` (the speed-of-light reference) at both the 64px and
    224px protocol shapes on v5e — 0.64 vs 0.56 ms/batch at bs=200
    n=20k/64px, 0.77 vs 0.74 ms at n=4k/224px (scripts/bench_gather.py,
    host-read-forced timing). The r1 one-hot bf16 matmul workaround
    measured 2-3x SLOWER once timed correctly (its FLOPs scale with
    dataset size: 2*bs*n*rowbytes ~ 98 GFLOP/batch at n=20k — on par
    with small_VGG9's own fwd+bwd), and the '~16ms jnp.take' number it
    was built on was an async-dispatch artifact of the tunneled backend.
    Returns uint8 rows."""
    return jnp.take(images, idx, axis=0)


def tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_scale_add(a, b, s):
    """a + s*b"""
    return jax.tree_util.tree_map(lambda x, y: x + s * y, a, b)


def tree_zeros_like(a):
    return jax.tree_util.tree_map(jnp.zeros_like, a)


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

class Engine:
    """Builds + caches the compiled train-epoch and eval functions for one
    EngineContext. Reusable across Phase-2 decay attempts (hyperparameters
    are device scalars inside mstate, so re-runs hit the jit cache)."""

    def __init__(self, ctx: EngineContext):
        self.ctx = ctx
        self._train_epoch = jax.jit(self._train_epoch_impl,
                                    static_argnums=(6,),
                                    donate_argnums=(0,))
        # chunked-streaming variant: rows arrive pre-shuffled by the host,
        # so batches are contiguous slices — no gather
        self._train_chunk = jax.jit(self._train_chunk_impl,
                                    static_argnums=(5,),
                                    donate_argnums=(0,))
        self._eval_batch_cache: dict = {}

    # ---- compiled pieces --------------------------------------------------

    def _base_loss_and_grads(self, trainable, batch_stats, batch, mstate,
                             rng):
        ctx = self.ctx
        x, y = batch
        rng_drop, rng_extra = jax.random.split(rng)

        def loss_fn(tr):
            feats, new_bs = ctx.forward_feats(
                tr["params"], batch_stats, x, True, rng_drop)
            logits = ctx.task_logits(tr, feats)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            extra = ctx.update_rule.extra_loss(
                ctx, tr, feats, batch, mstate, rng_extra,
                batch_stats=batch_stats)
            acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
            return ce + extra, (new_bs, ce, acc)

        (loss, (new_bs, ce, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)
        return loss, grads, new_bs, {"loss": ce, "acc": acc}

    def _train_step(self, state: TrainState, x_u8, y, rng, lr):
        ctx = self.ctx
        rule = ctx.update_rule
        rng_pre, rng_step = jax.random.split(rng)
        x = ctx.preprocess(rng_pre, x_u8)
        batch = (x, y)

        loss, grads, new_bs, metrics = rule.compute_grads(
            ctx, state.trainable, state.batch_stats, batch, state.mstate,
            rng_step, self._base_loss_and_grads) \
            if hasattr(rule, "compute_grads") else \
            self._base_loss_and_grads(state.trainable, state.batch_stats,
                                      batch, state.mstate, rng_step)

        raw_grads = grads
        penalty = rule.penalty_grads(state.trainable, state.mstate)
        if penalty is not None:
            grads = tree_add(grads, penalty)
        grads = rule.transform_grads(ctx, grads, state.trainable,
                                     state.mstate)
        if ctx.weight_decay:
            if ctx.l1_decay:
                grads = jax.tree_util.tree_map(
                    lambda g, p: g + ctx.weight_decay * jnp.sign(p),
                    grads, state.trainable)
            else:
                grads = tree_scale_add(grads, state.trainable,
                                       ctx.weight_decay)
        # freeze AFTER weight decay: the reference's freeze_mode optimizes
        # only the classifier (ref:main_SGD.py:69-72), so frozen backbone
        # weights must not decay either
        if ctx.freeze_backbone:
            grads = {**grads, "params": tree_zeros_like(grads["params"])}
        # torch-SGD momentum: buf = m*buf + d_p ; update = buf
        new_momentum = jax.tree_util.tree_map(
            lambda b, g: ctx.momentum * b + g, state.momentum, grads)
        updates = rule.mask_updates(ctx, new_momentum, state.mstate)
        new_trainable = tree_scale_add(state.trainable, updates, -lr)
        new_mstate = rule.post_step(ctx, state.mstate, state.trainable,
                                    new_trainable, raw_grads, batch,
                                    raw_images=x_u8)
        return TrainState(new_trainable, new_bs, new_momentum,
                          new_mstate), metrics

    def _train_epoch_impl(self, state, images, labels, perm, rng, lr, bsz):
        steps = perm.shape[0] // bsz

        def body(carry, i):
            st, r = carry
            r, sub = jax.random.split(r)
            idx = jax.lax.dynamic_slice_in_dim(perm, i * bsz, bsz)
            x = gather_rows_u8(images, idx)
            y = jnp.take(labels, idx, axis=0)
            st, metrics = self._train_step(st, x, y, sub, lr)
            return (st, r), metrics

        (state, _), metrics = jax.lax.scan(
            body, (state, rng), jnp.arange(steps))
        return state, jax.tree_util.tree_map(jnp.mean, metrics)

    def _train_chunk_impl(self, state, images, labels, rng, lr, bsz):
        """One chunk of a host-streamed epoch: rows are already shuffled
        (host gathered ``images[perm_chunk]``), so each batch is a
        contiguous ``dynamic_slice`` — the uint8 row-gather (and its
        one-hot-matmul workaround) is not needed at all. Metrics are
        per-batch means, NOT reduced over the chunk (the caller
        concatenates chunks before averaging)."""
        steps = images.shape[0] // bsz

        def body(carry, i):
            st, r = carry
            r, sub = jax.random.split(r)
            x = jax.lax.dynamic_slice_in_dim(images, i * bsz, bsz)
            y = jax.lax.dynamic_slice_in_dim(labels, i * bsz, bsz)
            st, metrics = self._train_step(st, x, y, sub, lr)
            return (st, r), metrics

        (state, _), metrics = jax.lax.scan(
            body, (state, rng), jnp.arange(steps))
        return state, metrics

    # ---- public API --------------------------------------------------------

    def _round_batch(self, batch_size: int, n: int) -> int:
        """Clamp batch_size to the dataset and round it down to a multiple
        of the mesh size so ``constrain_batch`` never sees non-divisible
        shards (e.g. bs=30 on an 8-device mesh)."""
        batch_size = min(int(batch_size), int(n))
        nd = self.ctx.mesh.devices.size if self.ctx.mesh is not None else 1
        if nd > 1 and batch_size % nd:
            batch_size = max((batch_size // nd) * nd, nd)
        return batch_size

    def train_epoch(self, state: TrainState, images, labels, perm, rng, lr,
                    batch_size: int):
        batch_size = self._round_batch(batch_size, int(perm.shape[0]))
        nd = self.ctx.mesh.devices.size if self.ctx.mesh is not None else 1
        if int(perm.shape[0]) < batch_size:
            raise ValueError(
                f"dataset of {int(perm.shape[0])} samples cannot fill one "
                f"batch of {batch_size} on a {nd}-device mesh")
        perm = perm[: (perm.shape[0] // batch_size) * batch_size]
        return self._train_epoch(state, images, labels, perm, rng,
                                 jnp.asarray(lr, jnp.float32), batch_size)

    def train_epoch_chunked(self, state: TrainState, images_np, labels_np,
                            perm, rng, lr, batch_size: int,
                            chunk_rows: int):
        """Streaming epoch for splits that exceed the HBM data budget
        (replaces the reference's disk-streaming DataLoaders,
        ref:src/methods/rehearsal/main_rehearsal.py:181-184): the global
        permutation is gathered on host into fixed-size contiguous uint8
        chunks that are ``device_put`` ahead of compute (async dispatch
        double-buffers the transfer), each driven through the same
        compiled train step."""
        n = int(perm.shape[0])
        batch_size = self._round_batch(batch_size, n)
        chunk_rows = max((int(chunk_rows) // batch_size) * batch_size,
                         batch_size)
        # never larger than the (batch-rounded) dataset itself
        chunk_rows = min(chunk_rows,
                         max((n // batch_size) * batch_size, batch_size))
        perm = np.asarray(perm)
        # wrap-pad the permutation so every row is seen at least once per
        # epoch and every chunk has the same (compiled-once) shape
        n_chunks = -(-n // chunk_rows)
        use = n_chunks * chunk_rows
        if use > n:
            perm = np.concatenate([perm, perm[: use - n]])
        rep = mesh_lib.replicated(self.ctx.mesh) \
            if self.ctx.mesh is not None else None
        lr_arr = jnp.asarray(lr, jnp.float32)
        metric_parts = []
        # pre-issue the first transfer, then overlap: host-gather chunk
        # k+1 while the device trains chunk k
        def put(c):
            rows = perm[c * chunk_rows: (c + 1) * chunk_rows]
            imgs = rowgather.gather_rows(images_np, rows)
            labs = np.ascontiguousarray(labels_np[rows])
            if rep is not None:
                return jax.device_put((imgs, labs), rep)
            return jnp.asarray(imgs), jnp.asarray(labs)

        next_buf = put(0)
        for c in range(n_chunks):
            imgs, labs = next_buf
            rng, sub = jax.random.split(rng)
            state, m = self._train_chunk(state, imgs, labs, sub, lr_arr,
                                         batch_size)
            if c + 1 < n_chunks:
                next_buf = put(c + 1)
            metric_parts.append(m)
        metrics = jax.tree_util.tree_map(
            lambda *parts: jnp.mean(jnp.concatenate(parts)), *metric_parts)
        return state, metrics

    def evaluate_chunked(self, trainable, batch_stats, images_np,
                         labels_np, batch_size: int, chunk_rows: int,
                         **kwargs):
        """Eval over host-resident splits too big for HBM: sequential
        fixed-size chunks, per-class counters accumulated across chunks."""
        n = int(images_np.shape[0])
        chunk_rows = max(int(chunk_rows), batch_size)
        total_c = total_t = None
        for lo in range(0, n, chunk_rows):
            hi = min(lo + chunk_rows, n)
            acc, pcc, pct = self.evaluate(
                trainable, batch_stats,
                jnp.asarray(np.ascontiguousarray(images_np[lo:hi])),
                jnp.asarray(np.ascontiguousarray(labels_np[lo:hi])),
                batch_size, **kwargs)
            total_c = pcc if total_c is None else total_c + pcc
            total_t = pct if total_t is None else total_t + pct
        acc = float(total_c.sum()) / max(float(total_t.sum()), 1.0)
        return acc, np.asarray(total_c), np.asarray(total_t)

    def evaluate(self, trainable, batch_stats, images, labels,
                 batch_size: int, predict: str | Callable = "task",
                 target_labels=None, n_counter_classes: int | None = None):
        """Masked-padded accuracy + per-class counters
        (ref:src/framework/inference.py:8-87 test_model semantics).

        ``predict``: "task" (current-task head), "shared" (extended shared
        head over all tasks — rehearsal eval), or a callable
        ``(ctx, trainable, feats) -> logits``.
        ``target_labels``: override labels (e.g. offset labels for shared
        eval)."""
        ctx = self.ctx
        nd = ctx.mesh.devices.size if ctx.mesh is not None else 1
        batch_size = min(int(batch_size), int(images.shape[0]))
        if nd > 1 and batch_size % nd:
            # round UP for eval: padded idx/weights absorb the overshoot
            batch_size += nd - batch_size % nd
        n = images.shape[0]
        n_batches = -(-n // batch_size)
        pad = n_batches * batch_size - n
        idx = np.concatenate([np.arange(n), np.zeros(pad, np.int64)])
        weights = np.concatenate([np.ones(n, np.float32),
                                  np.zeros(pad, np.float32)])
        idx = jnp.asarray(idx.reshape(n_batches, batch_size))
        weights = jnp.asarray(weights.reshape(n_batches, batch_size))
        y_all = jnp.asarray(labels if target_labels is None
                            else target_labels)
        if n_counter_classes is None:
            kernel_c = int(np.max(ctx.class_counts))
            n_counter_classes = (kernel_c * ctx.n_tasks
                                 if predict == "shared" else kernel_c)

        # cache value pins the predict callable: without the strong
        # reference, a freed closure's id() can be reused by a NEW closure
        # and silently hit a stale compiled eval
        key = (predict if isinstance(predict, str) else id(predict),
               batch_size, images.shape, n_counter_classes)
        entry = self._eval_batch_cache.get(key)
        stale = entry is not None and callable(predict) \
            and entry[1] is not predict
        if entry is None or stale:
            entry = (jax.jit(self._make_eval(predict, n_counter_classes)),
                     predict)
            self._eval_batch_cache[key] = entry
        eval_fn = entry[0]
        correct, total, per_class_c, per_class_t = eval_fn(
            trainable, batch_stats, images, y_all, idx, weights)
        acc = float(correct) / max(float(total), 1.0)
        return acc, np.asarray(per_class_c), np.asarray(per_class_t)

    def _make_eval(self, predict, n_classes: int):
        ctx = self.ctx
        zero_rng = jax.random.PRNGKey(0)

        def logits_of(tr, bs, x):
            feats, _ = ctx.forward_feats(tr["params"], bs, x, False, zero_rng)
            if callable(predict):
                return predict(ctx, tr, feats)
            if predict == "task":
                return ctx.task_logits(tr, feats)
            if predict == "shared":
                return ctx.shared_logits(tr, feats)
            raise ValueError(predict)

        def eval_fn(trainable, batch_stats, images, labels, idx, weights):

            def body(carry, inp):
                c, t, pcc, pct = carry
                bidx, w = inp
                x_u8 = gather_rows_u8(images, bidx)
                y = jnp.take(labels, bidx, axis=0)
                x = pp.preprocess(zero_rng, x_u8, ctx.mean, ctx.std,
                                  augment=False)
                if ctx.mesh is not None:
                    x = mesh_lib.constrain_batch(x, ctx.mesh)
                logits = logits_of(trainable, batch_stats, x)
                hit = (jnp.argmax(logits, -1) == y).astype(jnp.float32) * w
                pcc = pcc.at[y].add(hit)
                pct = pct.at[y].add(w)
                return (c + hit.sum(), t + w.sum(), pcc, pct), None

            init = (jnp.float32(0), jnp.float32(0),
                    jnp.zeros(n_classes, jnp.float32),
                    jnp.zeros(n_classes, jnp.float32))
            (c, t, pcc, pct), _ = jax.lax.scan(body, init, (idx, weights))
            return c, t, pcc, pct

        return eval_fn


# ---------------------------------------------------------------------------
# Host-side task-training controller
# ---------------------------------------------------------------------------

@dataclass
class TrainJob:
    exp_dir: str
    num_epochs: int = 70
    batch_size: int = 200
    lr: float = 5e-3
    saving_freq: int = 5            # ref:train_SGD.py saving_freq
    decay_threshold: int = 5        # lr x0.1 when count == 5
    early_stop_threshold: int = 10  # stop when count > 10
    resume: bool = True
    save_models_mode: bool = True
    seed: int = 7
    eval_batch_size: int = 0        # 0 -> use batch_size

    def __post_init__(self):
        if self.eval_batch_size == 0:
            self.eval_batch_size = self.batch_size


def model_state_dict(ctx: EngineContext, state: TrainState,
                     meta: dict | None = None,
                     include_aux: bool = True) -> dict:
    """The canonical on-disk model format ({'params','batch_stats','heads',
    'meta'[,'method_aux']}) — the inter-task / eval interchange artifact,
    replacing the reference's whole-module pickles (which carry
    ``model.reg_params`` along, hence ``method_aux``).

    ``include_aux=False`` skips the method-aux export: rehearsal-class
    rules export >100 MB of uint8 exemplar rows, and pulling that through
    the device tunnel on every improvement epoch dominated the epoch loop
    (measured ~10 s/epoch on the hd200 protocol). ``train_task`` builds
    its per-epoch snapshots without aux and attaches it ONCE per attempt
    (the past-task buffers a replay loss reads are static within an
    attempt; the current task's ring is the last-n rows seen either way,
    so the attempt-end ring is the same uniform exemplar sample)."""
    out = {
        "params": state.trainable["params"],
        "batch_stats": state.batch_stats,
        "heads": {"kernel": state.trainable["heads"]["kernel"],
                  "bias": state.trainable["heads"]["bias"],
                  "class_counts": np.asarray(ctx.class_counts)},
        "meta": dict(meta or {}),
    }
    if include_aux:
        aux = ctx.update_rule.export_aux(state.mstate)
        if aux is not None:
            out["method_aux"] = aux
    return io.to_host(out)


def state_from_model(model: dict, mstate: Any) -> TrainState:
    """Build a fresh TrainState (zero momentum) from a model-state dict."""
    trainable = {
        "params": jax.tree_util.tree_map(jnp.asarray, model["params"]),
        "heads": {"kernel": jnp.asarray(model["heads"]["kernel"]),
                  "bias": jnp.asarray(model["heads"]["bias"])},
    }
    batch_stats = jax.tree_util.tree_map(
        jnp.asarray, model.get("batch_stats", {}))
    return TrainState(trainable, batch_stats,
                      tree_zeros_like(trainable), mstate)


def data_budget_bytes() -> int:
    """HBM budget for device-resident split data. Splits above it stream
    through fixed-size chunks (`train_epoch_chunked`) like the reference's
    disk-backed DataLoaders; below it they live in HBM for the whole task
    (the fast path). Override with CLSURVEY_DATA_BUDGET_MB."""
    return int(os.environ.get("CLSURVEY_DATA_BUDGET_MB", "2048")) * 2 ** 20


def train_task(engine: Engine, job: TrainJob, state: TrainState,
               task_data, log: Callable = print):
    """Epoch loop with best-val tracking / lr decay / early stop / resume —
    behavior of ref:src/methods/Finetune/train_SGD.py:41-189 shared by every
    method. Returns (best_model_dict, best_val_acc, final_state)."""
    ctx = engine.ctx
    os.makedirs(job.exp_dir, exist_ok=True)
    ckpt_path = os.path.join(job.exp_dir, EPOCH_CKPT_FILENAME)
    best_path = os.path.join(job.exp_dir, BEST_MODEL_FILENAME)

    budget = data_budget_bytes()
    train_np = np.asarray(task_data.train.images)
    train_labels_np = np.asarray(task_data.train.labels)
    val_np = np.asarray(task_data.val.images)
    val_labels_np = np.asarray(task_data.val.labels)
    n_train = int(train_np.shape[0])
    row_bytes = max(train_np.nbytes // max(n_train, 1), 1)
    stream_train = train_np.nbytes > budget
    stream_val = val_np.nbytes > budget
    # half the budget per chunk: one in compute, one in flight
    chunk_rows = max(budget // 2 // row_bytes, 1)
    if stream_train:
        log(f"streaming train split ({train_np.nbytes / 2**20:.0f} MiB > "
            f"budget {budget / 2**20:.0f} MiB): "
            f"{chunk_rows}-row chunks")

    train_images = train_labels = val_images = val_labels = None
    if not stream_train:
        train_images = jnp.asarray(train_np)
        train_labels = jnp.asarray(train_labels_np)
    if not stream_val:
        val_images = jnp.asarray(val_np)
        val_labels = jnp.asarray(val_labels_np)

    if ctx.mesh is not None:
        # replicate everything up front so the first jitted call already sees
        # the steady-state shardings (avoids a second compile at epoch 1)
        rep = mesh_lib.replicated(ctx.mesh)
        state = jax.device_put(state, rep)
        if not stream_train:
            train_images, train_labels = jax.device_put(
                (train_images, train_labels), rep)
        if not stream_val:
            val_images, val_labels = jax.device_put(
                (val_images, val_labels), rep)

    start_epoch, lr = 0, job.lr
    best_acc, val_beat_counts = 0.0, 0
    best_model = None
    error_history: list = []  # per-epoch val error %, dumped as JSON
    history_path = os.path.join(job.exp_dir, "error_history.json")

    if job.resume and io.exists(ckpt_path):
        ck = io.load(ckpt_path)
        start_epoch = ck["epoch"] + 1
        lr = ck["lr"]
        best_acc = ck["best_acc"]
        val_beat_counts = ck["val_beat_counts"]
        if ck.get("orbax_state"):
            # large trees live in the Orbax dir next to the pickle
            from clsurvey_tpu.utils import orbax_io
            trees = orbax_io.load(ck["orbax_state"])
        else:
            trees = ck
        state = TrainState(
            jax.tree_util.tree_map(jnp.asarray, trees["trainable"]),
            jax.tree_util.tree_map(jnp.asarray, trees["batch_stats"]),
            jax.tree_util.tree_map(jnp.asarray, trees["momentum"]),
            jax.tree_util.tree_map(jnp.asarray, trees["mstate"]))
        if io.exists(best_path):
            best_model = io.load(best_path)
        if os.path.isfile(history_path):
            import json
            with open(history_path) as f:
                error_history = json.load(f).get("error_history", [])
            # the history file is written every epoch but the state ckpt
            # only every saving_freq: truncate so re-run epochs don't
            # append duplicate entries (index == epoch must hold)
            error_history = error_history[:start_epoch]
        log(f"=> resumed epoch {start_epoch} lr={lr:g} best={best_acc:.4f}")

    # host snapshot of the task-start model: the fallback for runs that
    # never improve (a NaN-aborted final state is itself poisoned and must
    # not chain into the next task)
    # aux_heavy rules (rehearsal family) defer the >100 MB exemplar-memory
    # export to one attach per attempt; everyone else keeps the exact
    # best-epoch aux snapshot (SI's path integral w MUST be the best-epoch
    # value — the reference pickles model.W inside the best checkpoint,
    # ref:src/methods/SI/train_SI.py early-stop save)
    aux_heavy = bool(getattr(ctx.update_rule, "aux_heavy", False))
    init_model = model_state_dict(
        ctx, state, meta={"task": ctx.task, "n_tasks": ctx.n_tasks,
                          "failed_attempt": True},
        include_aux=not aux_heavy)

    # periodic resume state: rehearsal-class mstates carry >100 MB of
    # uint8 exemplar rows; checkpointing them every saving_freq epochs
    # costs a full device->host pull each time, so large states stretch
    # the period 4x (a killed run redoes <=19 epochs instead of <=4)
    mstate_bytes = sum(getattr(x, "nbytes", 0)
                       for x in jax.tree_util.tree_leaves(state.mstate))
    ckpt_freq = job.saving_freq * (4 if mstate_bytes > (32 << 20) else 1)
    ran_epochs = False

    root_key = jax.random.PRNGKey(job.seed)
    for epoch in range(start_epoch, job.num_epochs):
        # early stop (ref:train_SGD.py:19-21: count > threshold)
        if val_beat_counts > job.early_stop_threshold:
            log("training terminated")
            break
        # decay (ref:train_SGD.py:24-29: count == threshold)
        if val_beat_counts == job.decay_threshold:
            lr = lr * 0.1
            log(f"lr is set to {lr:g}")

        ekey = jax.random.fold_in(root_key, epoch)
        pkey, skey = jax.random.split(ekey)
        perm = jax.random.permutation(pkey, n_train)
        ran_epochs = True
        if stream_train:
            state, metrics = engine.train_epoch_chunked(
                state, train_np, train_labels_np, np.asarray(perm), skey,
                lr, job.batch_size, chunk_rows)
        else:
            state, metrics = engine.train_epoch(
                state, train_images, train_labels, perm, skey, lr,
                job.batch_size)
        train_loss = float(metrics["loss"])
        train_acc = float(metrics["acc"])

        if stream_val:
            val_acc, _, _ = engine.evaluate_chunked(
                state.trainable, state.batch_stats, val_np, val_labels_np,
                job.eval_batch_size, chunk_rows)
        else:
            val_acc, _, _ = engine.evaluate(
                state.trainable, state.batch_stats, val_images, val_labels,
                job.eval_batch_size)
        log(f"epoch {epoch}: loss={train_loss:.4f} "
            f"train_acc={train_acc:.4f} val_acc={val_acc:.4f} lr={lr:g}")

        # per-epoch error history JSON next to the checkpoint
        # (ref:src/methods/packnet/main.py:287-291 dumps error_history)
        error_history.append(100.0 * (1.0 - val_acc))
        if job.save_models_mode:
            import json
            with open(history_path, "w") as f:
                json.dump({"error_history": error_history, "lr": lr,
                           "train_loss": train_loss}, f)

        if not np.isfinite(train_loss) or train_loss > DIVERGENCE_LOSS_BOUND:
            # NaN guard aborts training (ref:src/methods/SI/train_SI.py:242).
            # Finite-but-exploded losses are the same failure one epoch
            # earlier: without the bound, an exploded epoch at chance val
            # accuracy (> the initial best_acc of 0) is recorded as "best"
            # and its 1e11+-scale weights chain into the next task's
            # Phase-1, which then NaNs from epoch 0 (observed with SI
            # lambda-decay retries on trivially-separable data).
            log(f"diverged (loss={train_loss:.4g}) — aborting training")
            break

        if val_acc > best_acc:
            best_acc = val_acc
            val_beat_counts = 0
            best_model = model_state_dict(
                ctx, state, meta={"task": ctx.task, "n_tasks": ctx.n_tasks,
                                  "epoch": epoch, "val_acc": val_acc},
                include_aux=not aux_heavy)
            if job.save_models_mode:
                io.save(best_model, best_path)
                # memory telemetry next to every best model
                # (ref:src/methods/Finetune/train_SGD.py:142-144 pickles
                # cuda_mem_req next to the checkpoint)
                from clsurvey_tpu.utils import timing
                timing.save_mem_req(job.exp_dir)
        else:
            val_beat_counts += 1

        if job.save_models_mode and (epoch % ckpt_freq == 0
                                     or epoch == job.num_epochs - 1):
            meta = {"epoch": epoch, "lr": lr, "best_acc": best_acc,
                    "val_beat_counts": val_beat_counts}
            trees = {"trainable": io.to_host(state.trainable),
                     "batch_stats": io.to_host(state.batch_stats),
                     "momentum": io.to_host(state.momentum),
                     "mstate": io.to_host(state.mstate)}
            # Orbax is the native path for the (large) resume state; the
            # small pickle keeps the reference-style epoch dict + pointer
            # (SURVEY §5: pickle-compatible artifacts, Orbax internally)
            from clsurvey_tpu.utils import orbax_io
            if orbax_io.available():
                orbax_dir = ckpt_path + ".orbax"
                orbax_io.save(trees, orbax_dir)
                io.save({**meta, "orbax_state": orbax_dir}, ckpt_path)
            else:
                io.save({**meta, **trees}, ckpt_path)

    need_save = False
    if best_model is None:  # zero-epoch or fully-failed (e.g. NaN) runs
        best_model = init_model
        # downstream phases chain through best_model.pth.tar on disk;
        # a retained-but-never-improved attempt must still leave one
        need_save = True
    # aux_heavy: attach the method aux ONCE per attempt (see
    # model_state_dict): any path that completes an attempt ends here, so
    # every best_model a SUCCESS flag vouches for carries its aux. A
    # resumed already-complete attempt whose best_model (old format)
    # carries aux skips the re-pull.
    aux = (ctx.update_rule.export_aux(state.mstate) if aux_heavy else None)
    if aux is not None and (ran_epochs or "method_aux" not in best_model):
        best_model["method_aux"] = io.to_host(aux)
        need_save = True
    if need_save and job.save_models_mode:
        io.save(best_model, best_path)
    return best_model, best_acc, state
