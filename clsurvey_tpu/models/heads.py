"""Stacked multi-head bank — the TPU-native task-head mechanism.

The reference mutates ``model.classifier._modules[last_idx]`` to swap per-task
heads (ref:src/methods/method.py:230-235, ref:src/utilities/utils.py:235-262
``get_prev_heads``). Here heads are a single static-shape parameter bank

    kernel: (max_tasks, feat_dim, classes_per_task_max)
    bias:   (max_tasks, classes_per_task_max)

so that selecting a head is a gather (jit-friendly), running *all* heads (for
LwF distillation / shared-head replay eval) is one einsum on the MXU, and
unequal per-task class counts are handled by logit masking to -1e10 — the
trick the reference uses only for GEM's shared head
(ref:src/methods/rehearsal/model/gem.py:199-204), adopted globally per
SURVEY §7 hard-part 3."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e10

# Per-task head init scheme (CLSURVEY_HEAD_INIT):
#   "torch_default" — the reference's ACTUAL replaced-head init: every
#     task training swaps in a fresh ``nn.Linear(num_ftrs, out_dim)``
#     (ref:src/utilities/utils.py:68-71, ref:src/methods/Finetune/
#     main_SGD.py:59-63), whose torch default is kaiming_uniform(a=√5)
#     weights = U(±√(1/fan_in)) and bias U(±1/√fan_in) — NOT the
#     N(0, 0.01) of torchvision VGG's `_initialize_weights` (that only
#     touches the init-time classifier, which is always replaced).
#   "legacy" — 0.01·N(0,1) weights, zero bias: what this package shipped
#     through r3 (mis-citing the replace semantics). ~5× smaller warmup
#     signal; root cause of the h2h diagonal convergence gap (the ref
#     hits 100.0 on just-trained tasks at 10 epochs, ours stalled at
#     55-75 — docs/ref_head_to_head.md, shared-init study).
#   "torch_pinned:<base>" — the h2h bit-identical-init control (VERDICT
#     r4 #2): task t's head is the torch_default draw from a PRIVATE
#     ``torch.Generator`` seeded with ``base + task_counter``
#     (task_counter 1-based, like the reference's framework loop), drawn
#     by torch itself so the bytes match the clone's pinned
#     ``replace_last_classifier_layer`` (H2H_PIN_HEADS env, installed by
#     scripts/h2h/prepare_clone.py). Pinning by task — instead of
#     dumping every sequential draw — keeps the two sides bit-identical
#     even when their attempt/lr-run counts diverge mid-sequence (a
#     sequential dump would shift every later draw, and the attempt
#     count divergence is exactly what the h2h measures).
# Default stays "legacy" for round-4 artifact continuity (the protocol
# tables were produced with it and mixed-init rows are not comparable);
# flip to "torch_default" alongside a wholesale table regeneration.
HEAD_INIT_SCHEME = os.environ.get("CLSURVEY_HEAD_INIT", "legacy")


def _pinned_draw(base: int, task: int, feat_dim: int, num_classes: int):
    """torch_default-distribution head draw for 0-based ``task``, drawn
    with torch from Generator(base + task + 1) — weight then bias, the
    exact call order of ``nn.Linear.reset_parameters``. Returns
    (kernel (feat, C), bias (C,)) numpy arrays."""
    import torch

    g = torch.Generator().manual_seed(base + task + 1)
    bound = float(np.sqrt(1.0 / feat_dim))
    w = torch.empty(num_classes, feat_dim).uniform_(
        -bound, bound, generator=g)
    b = torch.empty(num_classes).uniform_(-bound, bound, generator=g)
    return w.numpy().T.copy(), b.numpy().copy()


def _pinned_base(scheme: str) -> int:
    return int(scheme.split(":", 1)[1])


def init_head_bank(key, max_tasks: int, feat_dim: int, num_classes: int,
                   class_counts=None, scheme: str | None = None) -> dict:
    """Create the bank. ``class_counts[t]`` = real #classes of task t
    (defaults to all = num_classes)."""
    scheme = scheme or HEAD_INIT_SCHEME
    if scheme.startswith("torch_pinned:"):
        base = _pinned_base(scheme)
        draws = [_pinned_draw(base, t, feat_dim, num_classes)
                 for t in range(max_tasks)]
        kernel = jnp.asarray(np.stack([d[0] for d in draws]))
        bias = jnp.asarray(np.stack([d[1] for d in draws]))
    elif scheme == "torch_default":
        kkey, bkey = jax.random.split(key)
        bound = float(np.sqrt(1.0 / feat_dim))
        kernel = jax.random.uniform(
            kkey, (max_tasks, feat_dim, num_classes), jnp.float32,
            -bound, bound)
        bias = jax.random.uniform(
            bkey, (max_tasks, num_classes), jnp.float32, -bound, bound)
    else:
        kkey, _ = jax.random.split(key)
        kernel = 0.01 * jax.random.normal(
            kkey, (max_tasks, feat_dim, num_classes), dtype=jnp.float32)
        bias = jnp.zeros((max_tasks, num_classes), dtype=jnp.float32)
    if class_counts is None:
        class_counts = [num_classes] * max_tasks
    return {
        "kernel": kernel,
        "bias": bias,
        # static metadata (numpy, not traced)
        "class_counts": np.asarray(class_counts, dtype=np.int32),
    }


def reinit_head(bank: dict, task: int, key, scheme: str | None = None) -> dict:
    """Fresh-init one task's head (new task starts with a new random head,
    matching the reference's replace-last-classifier-layer semantics,
    ref:src/methods/Finetune/main_SGD.py:50-70; see HEAD_INIT_SCHEME for
    the draw distribution)."""
    scheme = scheme or HEAD_INIT_SCHEME
    if scheme.startswith("torch_pinned:"):
        k, b = _pinned_draw(_pinned_base(scheme), task,
                            bank["kernel"].shape[1],
                            bank["kernel"].shape[2])
        return {**bank,
                "kernel": bank["kernel"].at[task].set(jnp.asarray(k)),
                "bias": bank["bias"].at[task].set(jnp.asarray(b))}
    if scheme == "torch_default":
        kkey, bkey = jax.random.split(key)
        feat_dim = bank["kernel"].shape[1]
        bound = float(np.sqrt(1.0 / feat_dim))
        kernel = bank["kernel"].at[task].set(jax.random.uniform(
            kkey, bank["kernel"].shape[1:], jnp.float32, -bound, bound))
        bias = bank["bias"].at[task].set(jax.random.uniform(
            bkey, bank["bias"].shape[1:], jnp.float32, -bound, bound))
        return {**bank, "kernel": kernel, "bias": bias}
    kernel = bank["kernel"].at[task].set(
        0.01 * jax.random.normal(key, bank["kernel"].shape[1:], jnp.float32))
    bias = bank["bias"].at[task].set(jnp.zeros(bank["bias"].shape[1:]))
    return {**bank, "kernel": kernel, "bias": bias}


def head_params(bank: dict) -> dict:
    """The trainable pytree leaves of the bank (metadata excluded)."""
    return {"kernel": bank["kernel"], "bias": bank["bias"]}


def forward(bank: dict, feats: jnp.ndarray, task: int) -> jnp.ndarray:
    """Logits of one task's head, invalid class slots masked to NEG_INF."""
    kernel = bank["kernel"][task]
    bias = bank["bias"][task]
    logits = feats @ kernel + bias
    n_valid = int(bank["class_counts"][task])
    if n_valid < logits.shape[-1]:
        mask = jnp.arange(logits.shape[-1]) < n_valid
        logits = jnp.where(mask, logits, NEG_INF)
    return logits


def forward_all(bank: dict, feats: jnp.ndarray, n_tasks: int) -> jnp.ndarray:
    """All heads at once: (B, n_tasks, C) via a single MXU einsum.

    Used by LwF/EBLL distillation over every previous head and by the
    shared-head replay eval (offset logits), replacing the reference's
    python loop over stacked head modules
    (ref:src/methods/LwF/AlexNet_LwF.py:14-38)."""
    kernel = bank["kernel"][:n_tasks]
    bias = bank["bias"][:n_tasks]
    logits = jnp.einsum("bf,tfc->btc", feats, kernel) + bias[None]
    counts = jnp.asarray(bank["class_counts"][:n_tasks])
    mask = jnp.arange(logits.shape[-1])[None, :] < counts[:, None]
    return jnp.where(mask[None], logits, NEG_INF)


def shared_logits(bank: dict, feats: jnp.ndarray, n_tasks: int) -> jnp.ndarray:
    """Flatten all heads into one extended shared head (B, n_tasks*C).

    Equivalent of the rehearsal family's single shared output layer with
    per-task offsets (ref:src/methods/rehearsal/model/common.py:
    ``compute_offsets``); invalid slots already NEG_INF-masked."""
    logits = forward_all(bank, feats, n_tasks)
    return logits.reshape(feats.shape[0], -1)


