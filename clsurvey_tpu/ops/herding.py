"""iCaRL exemplar herding, vectorized (SURVEY §7 hard-part 2).

The reference greedily picks, per class, the sample minimizing
``|| class_mean - (feat(x) + sum(feats of already-picked)) / (k+1) ||_2``
with an O(exemplars x dataset) python loop of forward passes
(ref:src/methods/rehearsal/model/icarl.py:314-480).

Because the model is frozen during herding, all candidate features can be
computed once; the greedy selection is then a k-step ``lax.scan`` of masked
argmins over the precomputed feature matrix — mathematically identical
selection, three orders of magnitude less compute."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k",))
def herd(features: jnp.ndarray, valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """Greedy herding order.

    features: (n, d) candidate features (frozen model).
    valid:    (n,) 1.0 for real candidates, 0.0 for padding.
    k:        number of exemplars to select (static).

    Returns indices (k,) int32 in selection order. If fewer than k valid
    candidates exist, later slots repeat the masked argmin of an all-inf
    cost (callers truncate by valid count)."""
    n, d = features.shape
    mean = (jnp.sum(features * valid[:, None], axis=0)
            / jnp.maximum(jnp.sum(valid), 1.0))

    def step(carry, ex_idx):
        taken, prev_sum = carry
        # cost_i = || mean - (feat_i + prev_sum)/(ex_idx+1) ||
        cand = (features + prev_sum[None, :]) / (ex_idx + 1.0)
        cost = jnp.linalg.norm(mean[None, :] - cand, axis=1)
        cost = jnp.where((taken > 0) | (valid < 0.5), jnp.inf, cost)
        win = jnp.argmin(cost).astype(jnp.int32)
        taken = taken.at[win].set(1.0)
        prev_sum = prev_sum + features[win]
        return (taken, prev_sum), win

    (_, _), order = jax.lax.scan(
        step, (jnp.zeros((n,), features.dtype),
               jnp.zeros((d,), features.dtype)),
        jnp.arange(k, dtype=jnp.float32))
    return order


def class_means(features: jnp.ndarray, labels: jnp.ndarray,
                n_classes: int) -> tuple:
    """Per-class mean features: (n_classes, d) and counts (n_classes,)."""
    one_hot = jax.nn.one_hot(labels, n_classes, dtype=features.dtype)
    sums = one_hot.T @ features
    counts = one_hot.sum(0)
    return sums / jnp.maximum(counts[:, None], 1.0), counts
