"""Rehearsal-based methods: GEM, iCaRL, and the replay baselines.

The reference keeps episodic memories as *image paths* and rebuilds
DataLoaders from disk every batch (ref:src/methods/rehearsal/model/
common.py:14-118, gem.py:233-255) — a major host-IO bottleneck. Here every
memory is a static-shape on-device tensor bundle inside the method state of
the compiled step:

    mem_images (n_tasks, M, H, W, 3) uint8 · mem_labels (n_tasks, M)
    mem_count (n_tasks,) · mem_cnt scalar (ring position)

so replay forwards, the GEM projection QP, herding and ring-buffer updates
all happen on device with zero host round-trips.

- **GEM** (ref:gem.py): per step, the CE gradient of the MEAN over every
  past task's full buffer (scanned in ``mem_batch`` chunks whose partial
  sums divide by the global valid count — chunk-size invariant; a
  documented deviation from the reference's sum of per-batch means,
  whose magnitude grows with the batch count, see DEVIATIONS.md and
  ``_memory_grads``); if any
  ``<g, g_mem> < 0``, the dual bound-QP projects g (ops/qp.py; the
  reference calls the quadprog C extension). Ring buffer filled from each
  batch's raw images. Task 1 only wraps the shared SI model + fills the
  buffer (``wrap_first_task_model``).
- **iCaRL** (ref:icarl.py): training = CE on the new-task part of the batch
  + lambda * T^2-scaled KL distillation of sampled exemplars against their
  stored pre-update outputs; ``poststep`` herds exemplars per class
  (ops/herding.py) and stores distillation targets; eval =
  nearest-class-mean over exemplar features.
- **Baselines** (ref:baseline_rehearsal_*.py): batch = new samples +
  guaranteed exemplars of every past task; loss = CE_new + mean of
  per-task exemplar CE. full-mem divides total capacity over seen tasks.

Documented deviations from the reference (behavior-level equivalents):
- the per-batch exemplar quota's remainder rows sample their source task
  uniformly per batch inside the compiled step (dynamic head selection)
  instead of python ``random.randint`` retry loops — same expectation;
- iCaRL's distillation term uses exact KLDivLoss('batchmean') semantics
  (icarl.py:64,582; torch-parity tested) as one pooled mean over a
  mixed-task exemplar sample per step, instead of the reference's
  per-task-batch running accumulation (icarl.py:585-593);
- dropout masks are per-element (flax) rather than one broadcast unit mask
  (gem.py:177-196), same retention probability;
- per-step exemplar batches are drawn uniformly WITH replacement
  (jax.random.randint) where the reference builds unique index sets
  (baseline_rehearsal_partial_mem.py:207-211, icarl.py permutation) —
  identical in expectation, cheaper under jit than a per-step
  permutation."""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from clsurvey_tpu.methods import common
from clsurvey_tpu.methods.base import Category, Method, UpdateRule
from clsurvey_tpu.methods.finetune import finetune_grid_train
from clsurvey_tpu.models import heads as heads_lib
from clsurvey_tpu.ops import herding as herd_lib
from clsurvey_tpu.ops import preprocess as pp
from clsurvey_tpu.ops.distill import icarl_distill
from clsurvey_tpu.ops.qp import gem_project_if_violating
from clsurvey_tpu.utils import io

NEG_INF = -1e10


# ---------------------------------------------------------------------------
# shared memory helpers
# ---------------------------------------------------------------------------

def fresh_task_memory(n_tasks: int, n_memories: int, input_size) -> dict:
    h, w = input_size
    return {
        "mem_images": jnp.zeros((n_tasks, n_memories, h, w, 3), jnp.uint8),
        "mem_labels": jnp.zeros((n_tasks, n_memories), jnp.int32),
        "mem_count": jnp.zeros((n_tasks,), jnp.int32),
        "mem_cnt": jnp.int32(0),
    }


def ring_buffer_update(mem: dict, task: int, x_u8, y) -> dict:
    """ref:gem.py:323-345 fill_buffer: store the batch prefix that fits,
    wrap the counter when the buffer fills."""
    n_mem = mem["mem_images"].shape[1]
    bsz = x_u8.shape[0]
    cnt = mem["mem_cnt"]
    pos = cnt + jnp.arange(bsz, dtype=jnp.int32)
    valid = pos < n_mem  # only the prefix that fits this cycle
    safe_pos = jnp.where(valid, pos, n_mem)  # OOB -> dropped
    # raw images may arrive as bf16 (one-hot matmul gather) with exact
    # uint8 values — cast back explicitly for the uint8 store
    images = mem["mem_images"].at[task, safe_pos].set(
        x_u8.astype(jnp.uint8), mode="drop")
    labels = mem["mem_labels"].at[task, safe_pos].set(
        y.astype(jnp.int32), mode="drop")
    effbsz = jnp.minimum(cnt + bsz, n_mem) - cnt
    new_cnt = cnt + effbsz
    count = mem["mem_count"].at[task].set(
        jnp.maximum(mem["mem_count"][task], new_cnt))
    new_cnt = jnp.where(new_cnt >= n_mem, 0, new_cnt)  # circular
    return {**mem, "mem_images": images, "mem_labels": labels,
            "mem_count": count, "mem_cnt": new_cnt}


def fill_buffer_from_data(mem: dict, task: int, images_u8: np.ndarray,
                          labels: np.ndarray, seed: int = 7) -> dict:
    """GEM task-1 postprocess: fill the buffer with the first n_memories
    shuffled samples (ref:gem.py:347-374 manage_memory)."""
    n_mem = int(mem["mem_images"].shape[1])
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(labels))[:n_mem]
    n = len(perm)
    images = mem["mem_images"].at[task, :n].set(jnp.asarray(
        images_u8[perm]))
    lbls = mem["mem_labels"].at[task, :n].set(jnp.asarray(
        labels[perm], dtype=jnp.int32))
    count = mem["mem_count"].at[task].set(n)
    return {**mem, "mem_images": images, "mem_labels": lbls,
            "mem_count": count}


def _sample_remainder_rows(rng, mem, t: int, rem: int, per_task_mem):
    """``rem`` exemplar rows whose source task is drawn uniformly from the
    ``t`` past tasks (per call, i.e. per batch) and whose slot index is
    uniform within that task's valid count."""
    r_task, r_idx = jax.random.split(rng)
    tt_dyn = jax.random.randint(r_task, (rem,), 0, t)
    limit = jnp.maximum(mem["mem_count"][:t], 1)
    if per_task_mem is not None:
        limit = jnp.minimum(limit, per_task_mem)
    u = jax.random.uniform(r_idx, (rem,))
    idx = jnp.floor(u * limit[tt_dyn]).astype(jnp.int32)
    return (mem["mem_images"][tt_dyn, idx], mem["mem_labels"][tt_dyn, idx],
            tt_dyn)


def _exemplar_split(n_append: int, n_parts: int) -> tuple:
    """(equal floor share per past task, remainder). The remainder is
    replayed from per-batch uniformly-sampled tasks (matching the
    reference's random remainder assignment in expectation,
    ref:baseline_rehearsal_partial_mem.py:195-200) — a static
    round-robin split would systematically starve the highest-index
    past tasks whenever n_append < n_parts."""
    return n_append // n_parts, n_append % n_parts


# ---------------------------------------------------------------------------
# GEM
# ---------------------------------------------------------------------------

class GEMRule(UpdateRule):
    aux_heavy = True  # uint8 exemplar memory: attach once per attempt

    def __init__(self, n_memories: int, mem_batch: int = 256):
        self.n_memories = int(n_memories)
        self.mem_batch = int(mem_batch)

    def init_state(self, trainable, hyperparams, ctx, memory=None):
        state = super().init_state(trainable, hyperparams, ctx)
        state["memory"] = memory if memory is not None else \
            fresh_task_memory(len(ctx.class_counts), self.n_memories,
                              ctx.spec.input_size)
        return state

    def _memory_grads(self, ctx, trainable, batch_stats, mstate, tt, rng):
        """Gradient of the MEAN CE over task tt's full buffer, accumulated
        in mem_batch chunks. Chunk-size invariant and remainder-complete:
        the last chunk re-slices from M-mb (dynamic_slice clamp) with the
        overlap masked out, and every chunk divides by the global valid
        count — unlike a sum of per-chunk means, whose magnitude grows
        with the chunk count and silently drops M % mb exemplars (that
        inflated gradient overpowers the fixed v>=margin QP bound and
        collapses training; see DEVIATIONS.md — the reference accumulates
        per-batch means, ref:gem.py:233-256)."""
        mem = mstate["memory"]
        imgs = mem["mem_images"][tt]
        lbls = mem["mem_labels"][tt]
        n_valid = mem["mem_count"][tt]
        M = imgs.shape[0]
        mb = min(M, self.mem_batch)
        nb = -(-M // mb)  # ceil: include the remainder chunk
        import optax

        def batch_grads(tr, x_u8, y, w):
            def loss_fn(tr):
                rng_pre, rng_d = jax.random.split(rng)
                x = ctx.preprocess(rng_pre, x_u8)
                feats, _ = ctx.forward_feats(tr["params"], batch_stats, x,
                                             True, rng_d)
                logits = heads_lib.forward(ctx.bank(tr), feats, tt)
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, y)
                return jnp.sum(ce * w) / jnp.maximum(n_valid, 1)

            return jax.grad(loss_fn)(tr)

        def body(acc, i):
            start = jnp.minimum(i * mb, M - mb)
            sl = jax.lax.dynamic_slice_in_dim(imgs, start, mb)
            yl = jax.lax.dynamic_slice_in_dim(lbls, start, mb)
            idxs = start + jnp.arange(mb)
            w = ((idxs >= i * mb) & (idxs < n_valid)).astype(jnp.float32)
            g = batch_grads(trainable, sl, yl, w)
            return jax.tree_util.tree_map(jnp.add, acc, g), None

        acc0 = jax.tree_util.tree_map(jnp.zeros_like, trainable)
        grads, _ = jax.lax.scan(body, acc0, jnp.arange(nb))
        return grads

    def _memory_grads_all(self, ctx, trainable, batch_stats, mstate, rng):
        """All past tasks' memory gradients, replayed SEQUENTIALLY over the
        task axis (lax.map) like the reference (gem.py:233-256).

        An earlier vmap-over-tasks variant batched all t-1 backward passes
        into one launch, but its activation footprint grows linearly with
        the task count — [t, mem_batch, 64, 64, 64] f32 conv temps hit
        19 GB at task 6 of the 10-task protocol (>15.75 GB v5e HBM) and
        can never reach task 10. Sequential replay keeps the footprint at
        one task's chunk while mem_batch rows still saturate the MXU per
        launch. Each row is the chunk-size-invariant FULL-BUFFER MEAN
        gradient (same deliberate deviation as _memory_grads — see its
        docstring + DEVIATIONS.md)."""
        t = ctx.task
        mem = mstate["memory"]
        imgs = mem["mem_images"][:t]     # (t, M, H, W, C)
        lbls = mem["mem_labels"][:t]     # (t, M)
        counts = mem["mem_count"][:t]    # (t,)
        tasks = jnp.arange(t)
        M = imgs.shape[1]
        mb = min(M, self.mem_batch)
        nb = -(-M // mb)  # ceil: include the remainder chunk
        import optax

        def one_task(task_imgs, task_lbls, n_valid, task_idx):
            def body(acc, i):
                # full-buffer MEAN in chunk-size-invariant form: clamped
                # remainder slice with overlap masked, global-count divisor
                # (see _memory_grads)
                start = jnp.minimum(i * mb, M - mb)
                sl = jax.lax.dynamic_slice_in_dim(task_imgs, start, mb)
                yl = jax.lax.dynamic_slice_in_dim(task_lbls, start, mb)
                idxs = start + jnp.arange(mb)
                w = ((idxs >= i * mb)
                     & (idxs < n_valid)).astype(jnp.float32)

                def loss_fn(tr):
                    rng_pre, rng_d = jax.random.split(rng)
                    x = ctx.preprocess(rng_pre, sl)
                    feats, _ = ctx.forward_feats(tr["params"], batch_stats,
                                                 x, True, rng_d)
                    # per-sample logits of THIS task's head (dynamic index)
                    bank = ctx.bank(tr)
                    kernel = bank["kernel"][task_idx]
                    bias = bank["bias"][task_idx]
                    logits = feats @ kernel + bias
                    n_c = jnp.asarray(ctx.class_counts)[task_idx]
                    mask = jnp.arange(logits.shape[-1]) < n_c
                    logits = jnp.where(mask, logits, NEG_INF)
                    ce = optax.softmax_cross_entropy_with_integer_labels(
                        logits, yl)
                    return jnp.sum(ce * w) / jnp.maximum(n_valid, 1)

                g = jax.grad(loss_fn)(trainable)
                return jax.tree_util.tree_map(jnp.add, acc, g), None

            acc0 = jax.tree_util.tree_map(jnp.zeros_like, trainable)
            grads, _ = jax.lax.scan(body, acc0, jnp.arange(nb))
            return ravel_pytree(grads)[0]

        return jax.lax.map(lambda a: one_task(*a),
                           (imgs, lbls, counts, tasks))  # (t, p)

    def compute_grads(self, ctx, trainable, batch_stats, batch, mstate,
                      rng, base_fn):
        loss, grads, new_bs, metrics = base_fn(trainable, batch_stats,
                                               batch, mstate, rng)
        if ctx.task == 0:
            return loss, grads, new_bs, metrics
        flat_g, unravel = ravel_pytree(grads)
        G = self._memory_grads_all(ctx, trainable, batch_stats, mstate, rng)
        projected, violated = gem_project_if_violating(
            flat_g, G, mstate["hyper"]["margin"])
        grads = unravel(projected.astype(flat_g.dtype))
        metrics = {**metrics,
                   "projected": violated.astype(jnp.float32)}
        return loss, grads, new_bs, metrics

    def post_step(self, ctx, mstate, old_trainable, new_trainable,
                  raw_grads, batch, raw_images=None):
        _, y = batch
        memory = ring_buffer_update(mstate["memory"], ctx.task, raw_images,
                                    y)
        return {**mstate, "memory": memory}

    def export_aux(self, mstate):
        return {"memory": mstate["memory"]}


# ---------------------------------------------------------------------------
# replay baselines
# ---------------------------------------------------------------------------

class ReplayRule(UpdateRule):
    """FT + guaranteed exemplar replay (ref:baseline_rehearsal_partial_mem
    ``observe_FT``). ``n_append`` exemplars per batch split over past tasks;
    loss adds the mean of per-task exemplar CE means."""

    aux_heavy = True  # uint8 exemplar memory: attach once per attempt

    def __init__(self, n_memories: int, n_append: int,
                 per_task_mem: int | None = None):
        self.n_memories = int(n_memories)       # buffer capacity per task
        self.n_append = int(n_append)
        self.per_task_mem = per_task_mem        # full-mem: truncated size

    def init_state(self, trainable, hyperparams, ctx, memory=None):
        state = super().init_state(trainable, hyperparams, ctx)
        state["memory"] = memory if memory is not None else \
            fresh_task_memory(len(ctx.class_counts), self.n_memories,
                              ctx.spec.input_size)
        return state

    def extra_loss(self, ctx, trainable, feats, batch, mstate, rng,
                   batch_stats=None):
        t = ctx.task
        if t == 0 or self.n_append <= 0:
            return jnp.float32(0.0)
        import optax

        mem = mstate["memory"]
        base, rem = _exemplar_split(self.n_append, t)
        losses = []
        for tt in range(t):
            if base == 0:
                continue
            rng, r_idx, r_pre, r_d = jax.random.split(rng, 4)
            limit = jnp.maximum(mem["mem_count"][tt], 1)
            if self.per_task_mem is not None:
                limit = jnp.minimum(limit, self.per_task_mem)
            idx = jax.random.randint(r_idx, (base,), 0, limit)
            x_u8 = mem["mem_images"][tt][idx]
            y = mem["mem_labels"][tt][idx]
            x = ctx.preprocess(r_pre, x_u8)
            feats_m, _ = ctx.forward_feats(trainable["params"],
                                           batch_stats or {}, x, True, r_d)
            logits = heads_lib.forward(ctx.bank(trainable), feats_m, tt)
            losses.append(jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, y)))
        if rem > 0:
            # remainder rows: task sampled uniformly PER BATCH (traced),
            # head selected dynamically via the stacked bank — every past
            # task keeps nonzero replay probability even when
            # n_append < t
            rng, r_s, r_pre, r_d = jax.random.split(rng, 4)
            x_u8, y, tt_dyn = _sample_remainder_rows(
                r_s, mem, t, rem, self.per_task_mem)
            x = ctx.preprocess(r_pre, x_u8)
            feats_m, _ = ctx.forward_feats(trainable["params"],
                                           batch_stats or {}, x, True, r_d)
            all_logits = heads_lib.forward_all(ctx.bank(trainable),
                                               feats_m, t)
            logits = jnp.take_along_axis(
                all_logits, tt_dyn[:, None, None],
                axis=1)[:, 0]
            losses.append(jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, y)))
        if not losses:
            return jnp.float32(0.0)
        return jnp.mean(jnp.stack(losses))

    def post_step(self, ctx, mstate, old_trainable, new_trainable,
                  raw_grads, batch, raw_images=None):
        _, y = batch
        memory = ring_buffer_update(mstate["memory"], ctx.task, raw_images,
                                    y)
        return {**mstate, "memory": memory}

    def export_aux(self, mstate):
        return {"memory": mstate["memory"]}


# ---------------------------------------------------------------------------
# iCaRL
# ---------------------------------------------------------------------------

class ICarlRule(UpdateRule):
    """CE on new data + lambda * distillation of sampled exemplars against
    stored pre-update outputs (ref:icarl.py:482-598), T=2."""

    T = 2.0
    aux_heavy = True  # uint8 exemplar store: attach once per attempt

    def __init__(self, n_append: int):
        self.n_append = int(n_append)

    def init_state(self, trainable, hyperparams, ctx, exemplars=None):
        state = super().init_state(trainable, hyperparams, ctx)
        assert exemplars is not None, "iCaRL needs the exemplar store"
        state["exemplars"] = exemplars
        return state

    def extra_loss(self, ctx, trainable, feats, batch, mstate, rng,
                   batch_stats=None):
        if ctx.task == 0 or self.n_append <= 0:
            return jnp.float32(0.0)
        ex = mstate["exemplars"]
        n_valid = jnp.maximum(ex["count"], 1)
        r_idx, r_pre, r_d = jax.random.split(rng, 3)
        idx = jax.random.randint(r_idx, (self.n_append,), 0, n_valid)
        x_u8 = ex["images"][idx]
        targets = ex["targets"][idx]          # (k, n_out) masked logits
        tasks = ex["task_ids"][idx]           # (k,)
        x = ctx.preprocess(r_pre, x_u8)
        feats_m, _ = ctx.forward_feats(trainable["params"],
                                       batch_stats or {}, x, True, r_d)
        logits = heads_lib.shared_logits(ctx.bank(trainable), feats_m,
                                         ctx.n_tasks)  # (k, n_out)
        # stored targets span the full task horizon; slice to active width
        targets = targets[:, :logits.shape[-1]]
        # mask each sample to its own task's class region
        kernel_c = ctx.bank(trainable)["kernel"].shape[-1]
        col = jnp.arange(logits.shape[-1])[None, :]
        lo = (tasks * kernel_c)[:, None]
        counts = jnp.asarray(ctx.class_counts)[tasks][:, None]
        region = (col >= lo) & (col < lo + counts)
        # KLDivLoss(reduction='batchmean') semantics, T=2
        # (ref:icarl.py:64 'batchmean', applied at :582)
        dist = icarl_distill(jnp.where(region, logits, NEG_INF),
                             jnp.where(region, targets, NEG_INF), self.T)
        dist = jnp.maximum(dist, 0.0)  # numerical guard (ref:icarl.py:586)
        return mstate["hyper"]["lambda"] * dist

    def export_aux(self, mstate):
        return {"exemplars": mstate["exemplars"]}


# ---------------------------------------------------------------------------
# host lifecycle
# ---------------------------------------------------------------------------

_FEAT_FN_CACHE: dict = {}


def _cached_feat_fn(ctx):
    """One jitted feature forward per (backbone, has-batch-stats): params
    ride as arguments, so T(T+1)/2 eval-matrix calls share one compile per
    batch shape instead of re-jitting a fresh closure per model."""
    key = (ctx.backbone, bool(ctx.spec.batch_norm))
    fn = _FEAT_FN_CACHE.get(key)
    if fn is None:
        def impl(params, batch_stats, x):
            return ctx.forward_feats(params, batch_stats, x, False,
                                     jax.random.PRNGKey(0))[0]

        fn = jax.jit(impl)
        _FEAT_FN_CACHE[key] = fn
    return fn


def _load_memory(model, fallback_fn):
    aux = model.get("method_aux")
    if aux and "memory" in aux:
        return jax.tree_util.tree_map(jnp.asarray, aux["memory"])
    return fallback_fn()


@dataclass
class GEM(Method):
    name: str = "GEM"
    category: Category = Category.REHEARSAL_BASED
    wrap_first_task_model: bool = True
    extra_hyperparams_count: int = 1
    hyperparams: "OrderedDict[str, float]" = field(
        default_factory=lambda: OrderedDict({"margin": 1}))
    static_hyperparams: "OrderedDict[str, float]" = field(
        default_factory=lambda: OrderedDict({"mem_per_task": 1024}))

    def _mem(self):
        return int(self.static_hyperparams["mem_per_task"])

    def grid_train(self, args, manager, lr):
        """Phase 1: plain FT (memory_strength=0, finetune mode,
        ref:method.py:321-325)."""
        return finetune_grid_train(args, manager, lr)

    def train(self, args, manager, hyperparams):
        prev_model = io.load(manager.previous_task_model_path)
        # mem_batch only chunks the buffer sweep (HBM bound); the memory
        # gradient is the exact full-buffer mean regardless of chunk size.
        # 128 measured fastest on v5e (scripts/bench_gem_sweep.py: 4,362
        # img/s vs 3,426 at 1024-row chunks) with a flat HBM footprint.
        rule = GEMRule(self._mem(), mem_batch=min(self._mem(), 128))
        n_tasks_total = manager.dataset.task_count
        memory = _load_memory(
            prev_model,
            lambda: fresh_task_memory(n_tasks_total, self._mem(),
                                      manager.dataset.input_size))
        proto = {"params": jax.tree_util.tree_map(jnp.asarray,
                                                  prev_model["params"]),
                 "heads": None}
        mstate = rule.init_state(proto, dict(hyperparams), None,
                                 memory=memory)
        engine = common.get_task_engine(manager, "gem_engine")
        best_model, best_acc, _, engine = common.run_training(
            manager, rule, lr=manager.extras["lr"],
            hyperparams=dict(hyperparams),
            exp_dir=manager.extras["heuristic_exp_dir"],
            start_model=prev_model, seed=args.seed, mstate=mstate,
            engine=engine, reinit_head=False)
        common.set_task_engine(manager, "gem_engine", engine)
        return best_model, best_acc

    def poststep(self, args, manager):
        """Task 1 only: wrap the SI model + fill the buffer with task-1
        samples (ref:method.py:301-320)."""
        if manager.task_counter > 1:
            return
        save_path = manager.best_model_path(1)
        if io.exists(save_path):
            manager.extras["best_model_path"] = save_path
            return
        model = io.load(manager.previous_task_model_path)
        memory = fresh_task_memory(manager.dataset.task_count, self._mem(),
                                   manager.dataset.input_size)
        td = manager.dataset.get_task_dataset(1)
        memory = fill_buffer_from_data(memory, 0, td.train.images,
                                       td.train.labels, seed=args.seed)
        model = dict(model)
        model["method_aux"] = io.to_host({"memory": memory})
        io.save(model, save_path)
        manager.extras["best_model_path"] = save_path
        manager.previous_task_model_path = save_path


@dataclass
class FinetuneRehearsalPartialMem(Method):
    name: str = "finetuning_rehearsal_partial_mem"
    category: Category = Category.BASELINE
    start_scratch: bool = True
    no_framework: bool = True
    static_hyperparams: "OrderedDict[str, float]" = field(
        default_factory=lambda: OrderedDict({"mem_per_task": 1024}))
    full_mem: bool = False

    def _make_rule(self, args, manager):
        mem = int(self.static_hyperparams["mem_per_task"])
        t = manager.task_counter - 1  # past tasks
        n_tasks_total = manager.dataset.task_count
        train_size = manager.current_task_dataset.train.size
        per_task_mem = None
        if self.full_mem:
            total = mem * n_tasks_total
            per_task_mem = total // manager.task_counter
            n_mem_samples = mem * n_tasks_total
        else:
            n_mem_samples = mem * t
        # exemplars-per-batch ratio (ref:main_rehearsal.py:186-207)
        if t > 0:
            ratio = n_mem_samples / (train_size + n_mem_samples)
            n_append = int(np.ceil(args.batch_size * ratio))
            n_append = min(n_append, args.batch_size - 1)
        else:
            n_append = 0
        return ReplayRule(mem, n_append, per_task_mem), n_append

    def grid_train(self, args, manager, lr):
        rule, n_append = self._make_rule(args, manager)
        # the framework always seeds previous_task_model_path before the
        # task loop (framework/main.py get_init_model_path) — fail loudly
        # rather than crash deep in _load_memory if that ever changes
        assert manager.previous_task_model_path, \
            "replay baseline needs a previous/init model path"
        prev_model = io.load(manager.previous_task_model_path)
        memory = _load_memory(
            prev_model,
            lambda: fresh_task_memory(
                manager.dataset.task_count,
                int(self.static_hyperparams["mem_per_task"]),
                manager.dataset.input_size))
        # reference baselines reset the ring cursor at every task switch
        # (ref:baseline_rehearsal_partial_mem.py:150 "Reset counter!!");
        # a carried mid-ring cursor would make mem_count cover the
        # never-written prefix [0, cnt) — zero images labeled class 0
        memory = {**memory, "mem_cnt": jnp.int32(0)}
        proto = {"params": jax.tree_util.tree_map(jnp.asarray,
                                                  prev_model["params"]),
                 "heads": None}
        mstate = rule.init_state(proto, {}, None, memory=memory)
        exp_dir = manager.extras["gridsearch_exp_dir"]
        seed = manager.extras.get("grid_seed", 0)
        # the new-data part of the batch shrinks by n_append
        saved_bs = args.batch_size
        args.batch_size = max(saved_bs - n_append, 1)
        engine = common.get_task_engine(manager, "replay_engine")
        try:
            best_model, best_acc, _, engine = common.run_training(
                manager, rule, lr=lr, hyperparams={}, exp_dir=exp_dir,
                start_model=prev_model, seed=seed, mstate=mstate,
                engine=engine)
        finally:
            args.batch_size = saved_bs
        common.set_task_engine(manager, "replay_engine", engine)
        return best_model, best_acc

    def grid_poststep(self, args, manager):
        from clsurvey_tpu.framework import lr_grid
        lr_grid.grid_poststep_symlink(args, manager)


@dataclass
class FinetuneRehearsalFullMem(FinetuneRehearsalPartialMem):
    name: str = "finetuning_rehearsal_full_mem"
    full_mem: bool = True


@dataclass
class ICARL(Method):
    name: str = "ICARL"
    category: Category = Category.REHEARSAL_BASED
    wrap_first_task_model: bool = True
    extra_hyperparams_count: int = 1
    hyperparams: "OrderedDict[str, float]" = field(
        default_factory=lambda: OrderedDict({"lambda": 10}))
    static_hyperparams: "OrderedDict[str, float]" = field(
        default_factory=lambda: OrderedDict({"mem_per_task": 1024}))

    def _total_mem(self, manager):
        return (int(self.static_hyperparams["mem_per_task"])
                * manager.dataset.task_count)

    def _fresh_exemplars(self, manager, kernel_c):
        K = self._total_mem(manager)
        h, w = manager.dataset.input_size
        n_out = kernel_c * manager.dataset.task_count
        return {
            "images": jnp.zeros((K, h, w, 3), jnp.uint8),
            "targets": jnp.full((K, n_out), NEG_INF, jnp.float32),
            "labels": jnp.zeros((K,), jnp.int32),     # shared class idx
            "task_ids": jnp.zeros((K,), jnp.int32),
            "count": jnp.int32(0),
        }

    def train(self, args, manager, hyperparams):
        prev_model = io.load(manager.previous_task_model_path)
        kernel_c = int(np.asarray(prev_model["heads"]["kernel"]).shape[-1])
        aux = prev_model.get("method_aux") or {}
        exemplars = aux.get("exemplars")
        if exemplars is None:
            exemplars = self._fresh_exemplars(manager, kernel_c)
        else:
            exemplars = jax.tree_util.tree_map(jnp.asarray, exemplars)
        # exemplar batch ratio like the baselines (ref:main_rehearsal.py)
        train_size = manager.current_task_dataset.train.size
        n_mem = self._total_mem(manager)
        ratio = n_mem / (train_size + n_mem)
        n_append = min(int(np.ceil(args.batch_size * ratio)),
                       args.batch_size - 1)
        rule = ICarlRule(n_append)
        proto = {"params": jax.tree_util.tree_map(jnp.asarray,
                                                  prev_model["params"]),
                 "heads": None}
        mstate = rule.init_state(proto, dict(hyperparams), None,
                                 exemplars=exemplars)
        saved_bs = args.batch_size
        args.batch_size = max(saved_bs - n_append, 1)
        # engine reused across Phase-2 decay attempts (same shapes/rule
        # config; only the hyper scalars in mstate change)
        engine = common.get_task_engine(manager, "icarl_engine")
        try:
            best_model, best_acc, _, engine = common.run_training(
                manager, rule, lr=manager.extras["lr"],
                hyperparams=dict(hyperparams),
                exp_dir=manager.extras["heuristic_exp_dir"],
                start_model=prev_model, seed=args.seed, mstate=mstate,
                engine=engine, reinit_head=False)
        finally:
            args.batch_size = saved_bs
        common.set_task_engine(manager, "icarl_engine", engine)
        return best_model, best_acc

    def grid_train(self, args, manager, lr):
        return finetune_grid_train(args, manager, lr)

    # ---- herding poststep (every task, ref:method.py:352-379) -------------
    def poststep(self, args, manager):
        t = manager.task_counter
        if t == 1:
            save_path = manager.best_model_path(1)
            src_path = manager.previous_task_model_path
        else:
            save_path = manager.extras["best_model_path"].replace(
                "best_model.pth.tar", "best_model_postprocessed.pth.tar")
            src_path = manager.extras["best_model_path"]
        if io.exists(save_path):
            manager.extras["best_model_path"] = save_path
            manager.previous_task_model_path = save_path
            return
        model = io.load(src_path)
        model = dict(model)
        model["method_aux"] = io.to_host(
            {"exemplars": self._herd(args, manager, model)})
        io.save(model, save_path)
        manager.extras["best_model_path"] = save_path
        manager.previous_task_model_path = save_path

    def _herd(self, args, manager, model):
        """Rebuild the full exemplar store: truncate old classes to the new
        per-class budget (keep selection order), herd the new task's
        classes, store distillation targets (ref:icarl.py:314-480)."""
        from clsurvey_tpu.engine.train import make_context

        t = manager.task_counter
        counts = manager.dataset.class_count_list()
        kernel_c = int(np.asarray(model["heads"]["kernel"]).shape[-1])
        cum_classes = sum(counts[:t])
        K = self._total_mem(manager)
        per_class = max(K // cum_classes, 1)

        ctx = make_context(
            spec=manager.model_spec, task=t - 1, n_tasks=t,
            class_counts=np.asarray(model["heads"]["class_counts"]),
            mean=manager.dataset.mean, std=manager.dataset.std,
            update_rule=UpdateRule(), augment=False)
        params = jax.tree_util.tree_map(jnp.asarray, model["params"])
        batch_stats = jax.tree_util.tree_map(
            jnp.asarray, model.get("batch_stats", {}))
        bank = {"kernel": jnp.asarray(model["heads"]["kernel"]),
                "bias": jnp.asarray(model["heads"]["bias"]),
                "class_counts": np.asarray(model["heads"]["class_counts"])}

        feat_raw = _cached_feat_fn(ctx)

        def feat_fn(x):
            return feat_raw(params, batch_stats, x)

        def feats_of(images_u8, bs=256):
            outs = []
            for i in range(0, len(images_u8), bs):
                x = pp.normalize(jnp.asarray(images_u8[i:i + bs]),
                                 ctx.mean, ctx.std)
                outs.append(np.asarray(feat_fn(x)))
            return np.concatenate(outs) if outs else np.zeros((0, 1))

        # previous store, truncated per class (order = priority)
        aux = model.get("method_aux") or {}
        old = aux.get("exemplars")
        per_class_imgs: dict[int, np.ndarray] = {}
        per_class_targets: dict[int, np.ndarray] = {}
        if old is not None:
            labels = np.asarray(old["labels"])[:int(old["count"])]
            imgs = np.asarray(old["images"])[:int(old["count"])]
            tgts = np.asarray(old["targets"])[:int(old["count"])]
            for c in np.unique(labels):
                sel = np.where(labels == c)[0][:per_class]
                per_class_imgs[int(c)] = imgs[sel]
                per_class_targets[int(c)] = tgts[sel]

        # herd new task's classes
        td = manager.dataset.get_task_dataset(t)
        offset = (t - 1) * kernel_c
        logits_fn = jax.jit(lambda x: heads_lib.shared_logits(
            bank, ctx.forward_feats(params, batch_stats, x, False,
                                    jax.random.PRNGKey(0))[0], t))
        for local_c in range(counts[t - 1]):
            sel = np.where(td.train.labels == local_c)[0]
            if len(sel) == 0:
                continue
            imgs_c = td.train.images[sel]
            feats = feats_of(imgs_c)
            k = min(per_class, len(sel))
            order = np.asarray(herd_lib.herd(
                jnp.asarray(feats), jnp.ones((len(sel),), jnp.float32), k))
            chosen = imgs_c[order]
            # distillation targets: masked shared logits of the exemplars
            x = pp.normalize(jnp.asarray(chosen), ctx.mean, ctx.std)
            targets = np.asarray(logits_fn(x))
            shared_c = offset + local_c
            per_class_imgs[shared_c] = chosen
            per_class_targets[shared_c] = targets

        # pack into the flat static store (writable host copies)
        store = jax.tree_util.tree_map(
            lambda x: np.array(x, copy=True),
            io.to_host(self._fresh_exemplars(manager, kernel_c)))
        capacity = int(store["images"].shape[0])
        pos = 0
        imgs_flat, tgt_flat, lbl_flat, task_flat = [], [], [], []
        for c in sorted(per_class_imgs):
            ims = per_class_imgs[c][:per_class]
            tg = per_class_targets[c][:per_class]
            # per_class is clamped to >= 1, so with more seen classes than
            # total capacity K the sum of per-class picks can exceed the
            # static store — trim to capacity instead of overflowing
            room = capacity - pos
            if room <= 0:
                break
            ims, tg = ims[:room], tg[:room]
            n = len(ims)
            imgs_flat.append(ims)
            # pad targets to full shared width
            full_t = np.full((n, store["targets"].shape[1]), NEG_INF,
                             np.float32)
            full_t[:, :tg.shape[1]] = tg[:, :store["targets"].shape[1]]
            tgt_flat.append(full_t)
            lbl_flat.append(np.full(n, c, np.int32))
            task_flat.append(np.full(n, c // kernel_c, np.int32))
            pos += n
        if pos:
            store["images"][:pos] = np.concatenate(imgs_flat)
            store["targets"][:pos] = np.concatenate(tgt_flat)
            store["labels"][:pos] = np.concatenate(lbl_flat)
            store["task_ids"][:pos] = np.concatenate(task_flat)
        store["count"] = np.int32(pos)
        return store

    # ---- NCM inference (ref:icarl.py:130-186) ------------------------------
    def inference_eval(self, manager, model_path, ref_task, trained_idx):
        """Nearest-class-mean over exemplar features, expressed as a linear
        head:  argmin_c ||f - mu_c||  ==  argmax_c (2 f.mu_c - ||mu_c||^2),
        so the NCM classifier is a synthesized (kernel=2mu, bias=-|mu|^2)
        task head — the standard cached eval path handles it (no per-model
        jit closures)."""
        from clsurvey_tpu.framework.evaluate import default_inference_eval
        from clsurvey_tpu.engine.train import make_context

        model = io.load(model_path) if isinstance(model_path, str) \
            else model_path
        aux = model.get("method_aux") or {}
        ex = aux.get("exemplars")
        counts = manager.dataset.class_count_list()
        kernel_c = int(np.asarray(model["heads"]["kernel"]).shape[-1])
        ctx = make_context(
            spec=manager.model_spec, task=ref_task - 1, n_tasks=ref_task,
            class_counts=np.asarray(model["heads"]["class_counts"]),
            mean=manager.dataset.mean, std=manager.dataset.std,
            update_rule=UpdateRule(), augment=False)
        params = jax.tree_util.tree_map(jnp.asarray, model["params"])
        batch_stats = jax.tree_util.tree_map(
            jnp.asarray, model.get("batch_stats", {}))

        # class means from exemplars of ref task's classes
        n_cls = counts[ref_task - 1]
        offset = (ref_task - 1) * kernel_c
        labels = np.asarray(ex["labels"])[:int(ex["count"])]
        imgs = np.asarray(ex["images"])[:int(ex["count"])]
        feat_raw = _cached_feat_fn(ctx)

        def feat_fn(x):
            return feat_raw(params, batch_stats, x)

        feat_dim = int(np.asarray(model["heads"]["kernel"]).shape[1])
        means = np.zeros((kernel_c, feat_dim), np.float32)
        present = np.zeros((kernel_c,), bool)
        for local_c in range(n_cls):
            sel = np.where(labels == offset + local_c)[0]
            if len(sel) == 0:
                continue
            x = pp.normalize(jnp.asarray(imgs[sel]), ctx.mean, ctx.std)
            means[local_c] = np.asarray(feat_fn(x)).mean(0)
            present[local_c] = True

        ncm_model = dict(model)
        kern = np.array(model["heads"]["kernel"], copy=True)
        bias = np.array(model["heads"]["bias"], copy=True)
        kern[ref_task - 1] = (2.0 * means).T
        bias[ref_task - 1] = np.where(
            present, -np.sum(means * means, axis=1), NEG_INF)
        ncm_model["heads"] = dict(model["heads"])
        ncm_model["heads"]["kernel"] = kern
        ncm_model["heads"]["bias"] = bias
        return default_inference_eval(manager, ncm_model, ref_task)
