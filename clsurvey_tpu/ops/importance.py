"""Importance-weight estimation kernels (EWC Fisher, MAS, IMM mode-Fisher).

TPU-native replacements for the reference's per-batch python loops with
backward passes:

- EWC: empirical diagonal Fisher over the previous task's train split,
  reproducing the reference's exact estimator — the *batch-summed* CE
  gradient squared, scaled by 1/N (ref:src/methods/EWC/main_EWC.py:138-157:
  ``omega += p.grad.data ** 2 / data_len`` where p.grad came from a
  sum-reduced NLL over the batch) — as one jitted lax.scan over batches.
- MAS: mean absolute per-sample gradient of the squared L2 norm of the
  output (ref:src/methods/MAS/train_MAS.py:505-567 with batch size 1,
  ``b1=True`` online mode in ref:src/methods/MAS/main_MAS.py:56-60),
  vectorized with chunked jax.vmap(jax.grad) instead of N single-sample
  backward passes.
- IMM mode: diagonal Fisher with labels *sampled* from the softmax
  (ref:src/methods/IMM/merge.py:155-185).

All estimators run on backbone params only (the reference's reg dict loses
the replaced head, see SURVEY §2.3) and reduce over the data axis with psum
when sharded (XLA inserts it from the shardings)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from clsurvey_tpu.ops import preprocess as pp


def _budget_chunk_rows(images_np, batch_size: int) -> int | None:
    """Rows per host chunk for splits over the HBM data budget, rounded to
    whole batches; None = the split fits resident (the fast path). Mirrors
    engine.train_task's streaming selection so a split that must stream
    for training also streams through its importance pass instead of
    OOMing HBM at the next task's preparation."""
    import numpy as np

    from clsurvey_tpu.engine.train import data_budget_bytes

    budget = data_budget_bytes()
    nbytes = int(np.asarray(images_np).nbytes)
    if nbytes <= budget:
        return None
    n = len(images_np)
    row = max(nbytes // max(n, 1), 1)
    rows = max((budget // 2 // row) // batch_size * batch_size, batch_size)
    return int(rows)


def _accumulate_chunked(estimate_chunk, images_np, labels_np, rows: int):
    """Global-mean accumulation over host chunks: each chunk's estimator
    returns a per-chunk mean, rescaled by chunk_n/total and summed —
    exactly the un-chunked value."""
    import numpy as np

    images_np = np.asarray(images_np)
    total = float(len(images_np))
    omega = None
    for lo in range(0, len(images_np), rows):
        hi = min(lo + rows, len(images_np))
        part = estimate_chunk(images_np[lo:hi],
                              None if labels_np is None
                              else np.asarray(labels_np)[lo:hi])
        scale = (hi - lo) / total
        part = jax.tree_util.tree_map(lambda p: p * scale, part)
        omega = part if omega is None else jax.tree_util.tree_map(
            jnp.add, omega, part)
    return omega


def _batched_indices(n: int, batch_size: int):
    """Truncate to whole batches (matches drop-last=False closely enough for
    importance estimation; the reference iterates all batches — we append a
    ragged tail batch padded with repeats but weighted 0)."""
    import numpy as np

    n_batches = -(-n // batch_size)
    pad = n_batches * batch_size - n
    idx = np.concatenate([np.arange(n), np.zeros(pad, np.int64)])
    w = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    return (jnp.asarray(idx.reshape(n_batches, batch_size)),
            jnp.asarray(w.reshape(n_batches, batch_size)))


# jitted estimator cache: flax modules hash by config, so identical
# (backbone, task, shapes) across tasks/calls reuse one compiled scan
# instead of recompiling per call (each `@jax.jit def run` wrapper is a
# fresh cache). LRU-bounded: each entry pins its closure (ctx, XLA
# executable), so a multi-method x multi-task sweep must not accumulate
# one forever-live executable per (method, task, dataset shape).
from collections import OrderedDict  # noqa: E402

_RUN_CACHE: OrderedDict = OrderedDict()
_RUN_CACHE_MAX = 8


def _cache_get(key):
    run = _RUN_CACHE.get(key)
    if run is not None:
        _RUN_CACHE.move_to_end(key)
    return run


def _cache_put(key, run):
    _RUN_CACHE[key] = run
    _RUN_CACHE.move_to_end(key)
    while len(_RUN_CACHE) > _RUN_CACHE_MAX:
        _RUN_CACHE.popitem(last=False)


def ewc_fisher(ctx, params, batch_stats, heads_bank, task: int,
               images_u8, labels, batch_size: int):
    """Diagonal Fisher over a dataset; returns a pytree like ``params``.

    Exactly mirrors the reference estimator: per batch, grad of the
    sum-reduced NLL wrt params, squared, accumulated /N. Host (numpy)
    inputs over the HBM data budget stream through chunks."""
    import numpy as np
    if isinstance(images_u8, np.ndarray):
        rows = _budget_chunk_rows(images_u8, batch_size)
        if rows is not None:
            return _accumulate_chunked(
                lambda xs, ys: ewc_fisher(
                    ctx, params, batch_stats, heads_bank, task,
                    jnp.asarray(xs), jnp.asarray(ys), batch_size),
                images_u8, labels, rows)
        images_u8 = jnp.asarray(images_u8)
        labels = jnp.asarray(labels)
    n = int(images_u8.shape[0])
    idx, w = _batched_indices(n, batch_size)
    zero_rng = jax.random.PRNGKey(0)
    import numpy as _np

    class_counts = _np.asarray(heads_bank["class_counts"])
    key = ("ewc", ctx.backbone, task, tuple(images_u8.shape), batch_size,
           ctx.mean, ctx.std, bool(batch_stats), tuple(class_counts))
    run = _cache_get(key)
    if run is None:
        def run_impl(params, batch_stats, kernel, bias,
                     images_u8, labels, idx, w):
            from clsurvey_tpu.engine.train import gather_rows_u8
            from clsurvey_tpu.models import heads as heads_lib

            # class_counts stays a concrete (np) constant: heads.forward
            # derives static mask widths from it
            bank = {"kernel": kernel, "bias": bias,
                    "class_counts": class_counts}
            n_total = jnp.sum(w)

            def batch_loss(p, x, y, wgt):
                feats, _ = ctx.forward_feats(p, batch_stats, x, False,
                                             zero_rng)
                logits = heads_lib.forward(bank, feats, task)
                losses = optax.softmax_cross_entropy_with_integer_labels(
                    logits, y)
                return jnp.sum(losses * wgt)

            def body(omega, inp):
                bidx, bw = inp
                x = pp.normalize(gather_rows_u8(images_u8, bidx),
                                 ctx.mean, ctx.std)
                y = jnp.take(labels, bidx, 0)
                g = jax.grad(batch_loss)(params, x, y, bw)
                return jax.tree_util.tree_map(
                    lambda o, gi: o + gi * gi / n_total, omega, g), None

            omega0 = jax.tree_util.tree_map(jnp.zeros_like, params)
            omega, _ = jax.lax.scan(body, omega0, (idx, w))
            return omega

        run = jax.jit(run_impl)
        _cache_put(key, run)
    return run(params, batch_stats, heads_bank["kernel"],
               heads_bank["bias"], images_u8, labels, idx, w)


def mas_importance(ctx, params, batch_stats, heads_bank, task: int,
                   images_u8, chunk: int = 16):
    """MAS omega: running mean of |per-sample grad of ||f(x)||_2^2|.

    The reference runs batch-size-1 backward passes over the whole previous
    dataset; here chunked vmap computes per-sample grads in parallel (the
    math is identical: mean of per-sample |g|). Host (numpy) inputs over
    the HBM data budget stream through chunks."""
    import numpy as np

    if isinstance(images_u8, np.ndarray):
        rows = _budget_chunk_rows(images_u8, chunk)
        if rows is not None:
            return _accumulate_chunked(
                lambda xs, ys: mas_importance(
                    ctx, params, batch_stats, heads_bank, task,
                    jnp.asarray(xs), chunk),
                images_u8, None, rows)
        images_u8 = jnp.asarray(images_u8)
    n = int(images_u8.shape[0])
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    idx = np.concatenate([np.arange(n), np.zeros(pad, np.int64)])
    w = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    idx = jnp.asarray(idx.reshape(n_chunks, chunk))
    w = jnp.asarray(w.reshape(n_chunks, chunk))
    zero_rng = jax.random.PRNGKey(0)

    # masked head slots are a huge negative constant; the squared norm runs
    # over the first n_valid outputs only (the reference model has exactly
    # n_valid outputs)
    n_valid = int(heads_bank["class_counts"][task])
    import numpy as _np

    key = ("mas", ctx.backbone, task, tuple(images_u8.shape), chunk,
           ctx.mean, ctx.std, bool(batch_stats),
           tuple(_np.asarray(heads_bank["class_counts"])))
    run = _cache_get(key)
    if run is None:
        def run_impl(params, batch_stats, kernel, bias,
                     images_u8, idx, w):
            from clsurvey_tpu.engine.train import gather_rows_u8
            from clsurvey_tpu.models import heads as heads_lib

            bank = {"kernel": kernel, "bias": bias,
                    "class_counts": _np.asarray(heads_bank["class_counts"])}
            n_total = jnp.sum(w)

            def sq_norm(p, x1):
                feats, _ = ctx.forward_feats(p, batch_stats, x1[None],
                                             False, zero_rng)
                logits = heads_lib.forward(bank, feats, task)
                return jnp.sum(logits[:, :n_valid] ** 2)

            psg = jax.vmap(jax.grad(sq_norm), in_axes=(None, 0))

            def body(acc, inp):
                cidx, cw = inp
                x = pp.normalize(gather_rows_u8(images_u8, cidx),
                                 ctx.mean, ctx.std)
                g = psg(params, x)
                return jax.tree_util.tree_map(
                    lambda a, gi: a + jnp.tensordot(cw, jnp.abs(gi),
                                                    axes=1) / n_total,
                    acc, g), None

            acc0 = jax.tree_util.tree_map(jnp.zeros_like, params)
            omega, _ = jax.lax.scan(body, acc0, (idx, w))
            return omega

        run = jax.jit(run_impl)
        _cache_put(key, run)
    return run(params, batch_stats, heads_bank["kernel"],
               heads_bank["bias"], images_u8, idx, w)


def imm_mode_fisher(ctx, params, batch_stats, heads_bank, task: int,
                    splits, batch_size: int, rng):
    """mode-IMM precision matrix (ref:src/methods/IMM/merge.py:155-185):
    initialized at 1e-8; for each split (train AND val), per batch the model
    samples labels from its softmax, takes the *mean*-reduced NLL gradient,
    and accumulates ``grad^2 / n_batches_of_split``.

    ``splits``: list of (images_u8, ) tuples or arrays."""
    from clsurvey_tpu.models import heads as heads_lib

    zero_rng = jax.random.PRNGKey(0)

    def batch_loss(p, x, y):
        feats, _ = ctx.forward_feats(p, batch_stats, x, False, zero_rng)
        logits = heads_lib.forward(heads_bank, feats, task)
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, y))

    @jax.jit
    def run_split(omega, params, images_u8, rng):
        n = images_u8.shape[0]
        n_batches = n // batch_size  # reference drops no batches; close
        idx = jnp.arange(n_batches * batch_size).reshape(n_batches,
                                                         batch_size)

        def body(carry, bidx):
            om, r = carry
            r, sub = jax.random.split(r)
            x = pp.normalize(jnp.take(images_u8, bidx, 0), ctx.mean, ctx.std)
            feats, _ = ctx.forward_feats(params, batch_stats, x, False,
                                         zero_rng)
            logits = heads_lib.forward(heads_bank, feats, task)
            sampled = jax.random.categorical(sub, logits)
            g = jax.grad(batch_loss)(params, x, sampled)
            om = jax.tree_util.tree_map(
                lambda o, gi: o + gi * gi / n_batches, om, g)
            return (om, r), None

        (omega, _), _ = jax.lax.scan(body, (omega, rng), idx)
        return omega

    import numpy as np

    omega = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 1e-8), params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    for images_u8 in splits:
        images_np = np.asarray(images_u8)
        usable = (len(images_np) // batch_size) * batch_size
        if usable == 0:
            continue
        rows = _budget_chunk_rows(images_np[:usable], batch_size)
        if rows is None:
            rng, sub = jax.random.split(rng)
            contrib = run_split(zeros, params,
                                jnp.asarray(images_np[:usable]), sub)
        else:
            # chunked: run_split normalizes by ITS chunk's batch count, so
            # rescale each chunk by chunk_batches/split_batches (exact
            # split mean; the rng stream differs from the resident path,
            # harmless for a sampled-label Fisher)
            total_b = usable // batch_size
            contrib = None
            for lo in range(0, usable, rows):
                hi = min(lo + rows, usable)
                rng, sub = jax.random.split(rng)
                part = run_split(zeros, params,
                                 jnp.asarray(images_np[lo:hi]), sub)
                part = jax.tree_util.tree_map(
                    lambda p: p * ((hi - lo) // batch_size) / total_b,
                    part)
                contrib = part if contrib is None else \
                    jax.tree_util.tree_map(jnp.add, contrib, part)
        omega = jax.tree_util.tree_map(jnp.add, omega, contrib)
    return omega
