"""PackNet ownership-mask operations (ref:src/methods/packnet/prune.py).

Masks are uint8 pytrees over the backbone's conv/dense *kernels* (the
reference's SparsePruner tracks nn.Conv2d/nn.Linear ``.weight`` only):
value = 1-based task id owning the weight, 0 = free/pruned. Non-maskable
leaves (biases, BN params) carry a 0-d uint8 sentinel so the mask tree has
the same pytree structure as the params. All ops are vectorized tree_maps;
pruning's kth-value cutoff is a sort per layer."""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SENTINEL = 255  # 0-d marker: leaf is not maskable (bias / BN param)


def _maskable(m) -> bool:
    return m.ndim > 0


def is_kernel_path(path) -> bool:
    """Mask only conv/dense kernels (not biases, not BN scales)."""
    last = path[-1]
    name = getattr(last, "key", getattr(last, "name", ""))
    return name == "kernel"


def init_masks(params, owner: int = 0):
    """Fresh masks over kernel leaves; non-kernel leaves get a sentinel."""
    def init(path, leaf):
        if is_kernel_path(path) and leaf.ndim > 1:
            return jnp.full(leaf.shape, owner, jnp.uint8)
        return jnp.uint8(_SENTINEL)
    return jax.tree_util.tree_map_with_path(init, params)


def claim_free(masks, task_id: int):
    """make_finetuning_mask (ref:prune.py:141-155): free (0) weights become
    the current task's."""
    return jax.tree_util.tree_map(
        lambda m: jnp.where(m == 0, jnp.uint8(task_id), m)
        if _maskable(m) else m, masks)


def prune_masks(params, masks, task_id: int, prune_perc):
    """pruning_mask (ref:prune.py:24-73): per layer, among the current
    task's weights, zero the mask of the lowest-|w| ``prune_perc`` fraction
    and zero those weights. Returns (new_params, new_masks)."""
    def new_weight_and_mask(w, m):
        if not _maskable(m):
            return w, m
        remove = _remove_mask(w, m)  # one sort per leaf, shared by both
        return jnp.where(remove, 0.0, w), jnp.where(remove, jnp.uint8(0), m)

    def _remove_mask(w, m):
        owned = m == task_id
        n_owned = jnp.sum(owned)
        absw = jnp.abs(w)
        flat = jnp.where(owned, absw, jnp.inf).ravel()
        order = jnp.sort(flat)
        k = jnp.round(jnp.asarray(prune_perc, jnp.float32)
                      * n_owned).astype(jnp.int32)
        k = jnp.clip(k, 1, flat.shape[0]) - 1
        cutoff = order[k]
        return owned & (absw <= cutoff) & (n_owned > 0)

    _is_pair = lambda x: isinstance(x, tuple)  # noqa: E731
    pairs = jax.tree_util.tree_map(new_weight_and_mask, params, masks)
    new_params = jax.tree_util.tree_map(lambda p: p[0], pairs,
                                        is_leaf=_is_pair)
    new_masks = jax.tree_util.tree_map(lambda p: p[1], pairs,
                                       is_leaf=_is_pair)
    return new_params, new_masks


def mask_grads(grads, masks, task_id: int, train_bn: bool = False):
    """make_grads_zero (ref:prune.py:73-99): only the current task's kernel
    weights train; biases are always frozen; BN scale/bias grads flow when
    ``train_bn`` (the reference sets train_bn=True whenever the model has
    batchnorm, ref:src/methods/method.py:538, prune.py:93-97)."""
    def per_leaf(path, g, m):
        if not _maskable(m):
            if train_bn and _is_bn_path(path):
                return g
            return jnp.zeros_like(g)
        return jnp.where(m == task_id, g, 0.0)

    return jax.tree_util.tree_map_with_path(per_leaf, grads, masks)


def _is_bn_path(path) -> bool:
    for part in path:
        name = str(getattr(part, "key", getattr(part, "name", "")))
        if name.startswith("bn_") or name.startswith("BatchNorm"):
            return True
    return False


def apply_eval_mask(params, masks, dataset_idx: int):
    """apply_mask (ref:prune.py:106-123): zero weights that are free (0) or
    were trained after ``dataset_idx`` (1-based)."""
    def per_leaf(w, m):
        if not _maskable(m):
            return w
        keep = (m != 0) & (m <= dataset_idx)
        return jnp.where(keep, w, 0.0)

    return jax.tree_util.tree_map(per_leaf, params, masks)


def zero_pruned(params, masks):
    """make_pruned_zero (ref:prune.py:101-105)."""
    return jax.tree_util.tree_map(
        lambda w, m: w if not _maskable(m) else jnp.where(m == 0, 0.0, w),
        params, masks)


def capacity_report(masks, n_tasks: int) -> dict:
    """mask_summary analog: fraction of weights owned per task id."""
    totals = {t: 0 for t in range(n_tasks + 1)}
    n_all = 0
    for m in jax.tree_util.tree_leaves(masks):
        if not _maskable(m):
            continue
        import numpy as np

        m = np.asarray(m)
        n_all += m.size
        for t in range(n_tasks + 1):
            totals[t] += int((m == t).sum())
    return {t: (c / max(n_all, 1)) for t, c in totals.items()}
