"""Knowledge-distillation losses (LwF / EBLL / iCaRL).

``lwf_distill`` reproduces the reference's distillation cross-entropy
exactly (ref:src/methods/LwF/main_LWF.py:47-75): both student and teacher
logits are max-normalized, the teacher target is softmax(t/T) (the code's
softmax(t)^(1/T) renormalized — the same distribution), the student term is
``logsumexp(y/T) - sum(p_t * y/T)``, averaged over the batch. No T^2
scaling (gradients match the reference's)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lwf_distill(student_logits: jnp.ndarray, teacher_logits: jnp.ndarray,
                T: float = 2.0) -> jnp.ndarray:
    """(B, C) x (B, C) -> scalar."""
    y = student_logits - jnp.max(student_logits, axis=1, keepdims=True)
    ysafe = y / T
    t = teacher_logits - jnp.max(teacher_logits, axis=1, keepdims=True)
    p_t = jax.nn.softmax(t / T, axis=1)
    loss = (jax.nn.logsumexp(ysafe, axis=1)
            - jnp.sum(p_t * ysafe, axis=1))
    return jnp.mean(loss)


def lwf_distill_multi(student_all: jnp.ndarray, teacher_all: jnp.ndarray,
                      T: float = 2.0) -> jnp.ndarray:
    """All previous heads at once: (B, n_prev, C) pairs -> summed scalar
    (the reference sums per-head distillation losses,
    ref:src/methods/LwF/main_LWF.py:190-194)."""
    def per_head(pair):
        s, t = pair
        return lwf_distill(s, t, T)

    losses = jax.vmap(lambda s, t: lwf_distill(s, t, T),
                      in_axes=(1, 1))(student_all, teacher_all)
    return jnp.sum(losses)


def icarl_distill(student_logits: jnp.ndarray, teacher_logits: jnp.ndarray,
                  T: float = 2.0) -> jnp.ndarray:
    """iCaRL's exemplar distillation with torch
    ``KLDivLoss(reduction='batchmean')`` semantics: pointwise
    ``KL(softmax(t/T) || softmax(s/T))`` SUMMED over classes, MEANED over
    the batch, scaled by T^2 (ref:src/methods/rehearsal/model/icarl.py:64
    builds the loss, :578-582 applies it to T-softened log/softmax pairs).

    Accepts NEG_INF-masked logits (rows restricted to one task's class
    region): masked entries produce p_t = 0 and contribute nothing."""
    log_p_s = jax.nn.log_softmax(student_logits / T, axis=1)
    p_t = jax.nn.softmax(teacher_logits / T, axis=1)
    kl_el = jnp.where(p_t > 0,
                      p_t * (jnp.log(jnp.maximum(p_t, 1e-30)) - log_p_s),
                      0.0)
    return jnp.mean(jnp.sum(kl_el, axis=1)) * (T ** 2)
