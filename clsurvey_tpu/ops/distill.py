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


def icarl_distill(student_logits: jnp.ndarray, teacher_probs: jnp.ndarray,
                  T: float = 2.0) -> jnp.ndarray:
    """iCaRL's exemplar distillation: KL-style soft CE against stored
    pre-update output probabilities (ref:src/methods/rehearsal/model/
    icarl.py:482-598 uses T=2 softened targets)."""
    y = student_logits / T
    log_p = jax.nn.log_softmax(y, axis=1)
    return -jnp.mean(jnp.sum(teacher_probs * log_p, axis=1))
