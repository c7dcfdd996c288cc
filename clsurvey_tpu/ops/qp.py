"""GEM's dual QP, solved on-device.

The reference calls the ``quadprog`` C extension per violating batch
(ref:src/methods/rehearsal/model/gem.py:58-80 ``project2cone2``): with
memory-gradient matrix M (t x p) and proposed gradient g,

    P = M M^T (symmetrized) + eps*I,  q = M g,  solve
    min_v  1/2 v^T P v - q^T v   s.t.  v >= margin        (bounds only!)
    projected gradient: x = M^T v + g

Because the constraints are simple bounds, the exact solution is reachable
with a primal-dual active-set method (PDAS): at each iteration, free
variables solve the reduced linear system, clamped variables sit at the
bound, and the active set updates from the KKT residuals. For t <= ~40 the
whole solve is a handful of t x t linear solves — trivially cheap on the
MXU, fully jittable (fixed iteration count + masked solves), and exact at
the fixpoint.

A bit-identical C++ implementation (native/qp.cpp) is the golden reference
and host fallback, playing the role quadprog plays for the reference."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

GEM_EPS = 1e-3  # ref:gem.py:58 eps=1e-3 added to the diagonal


@functools.partial(jax.jit, static_argnames=("iters",))
def solve_bound_qp(P: jnp.ndarray, q: jnp.ndarray, lb: jnp.ndarray,
                   iters: int = 0):
    """min 1/2 v'Pv - q'v  s.t. v >= lb, via PDAS with masked solves.

    Returns the clamped primal-feasible ``v``. ``iters`` defaults to
    3t+24: PDAS typically converges in <= t active-set changes, and the
    extra fixed iterations are nearly free at these sizes (t <= 40) while
    guarding the rare cycling active set on near-degenerate gradients."""
    t = P.shape[0]
    if iters == 0:
        iters = 3 * t + 24

    def masked_solve(active):
        free = 1.0 - active
        # system: P_FF v_F = q_F - P_FA lb_A ; v_A = lb_A
        M = P * (free[:, None] * free[None, :]) + jnp.diag(active)
        rhs = free * (q - P @ (lb * active)) + active * lb
        return jnp.linalg.solve(M, rhs)

    def body(carry, _):
        active, _ = carry
        v = masked_solve(active)
        mu = P @ v - q  # multiplier estimate; ~0 on free vars
        # PDAS update: active where (lb - v) + mu > 0
        new_active = ((lb - v) + mu > 0.0).astype(P.dtype)
        return (new_active, v), None

    active0 = jnp.zeros((t,), P.dtype)
    (active, v), _ = jax.lax.scan(body, (active0, jnp.zeros_like(q)),
                                  None, length=iters)
    v = masked_solve(active)
    return jnp.maximum(v, lb)  # safeguard clamp


def gem_project(grad_flat: jnp.ndarray, mem_grads: jnp.ndarray,
                margin: jnp.ndarray):
    """ref ``project2cone2``: returns the projected gradient x = M^T v + g.

    grad_flat: (p,) current-task gradient
    mem_grads: (t, p) past-task memory gradients
    margin:    scalar (GEM's decayed hyperparameter)"""
    M = mem_grads.astype(jnp.float32)
    g = grad_flat.astype(jnp.float32)
    t = M.shape[0]
    P = M @ M.T
    P = 0.5 * (P + P.T) + jnp.eye(t, dtype=P.dtype) * GEM_EPS
    # quadprog minimizes 1/2 v'Pv - a'v with a = -(M g) in the reference
    # call (ref:gem.py:76 ``q = np.dot(memories_np, gradient_np) * -1``);
    # our solver uses the same min 1/2 v'Pv - q'v form, so q = -(M g).
    q = -(M @ g)
    lb = jnp.full((t,), margin, P.dtype)
    v = solve_bound_qp(P, q, lb)
    return M.T @ v + g


def gem_project_if_violating(grad_flat, mem_grads, margin):
    """Project only when any <g, g_mem> < 0 (ref:gem.py:275-283), as a
    lax.cond so both branches stay on device."""
    dot = mem_grads @ grad_flat
    violates = jnp.any(dot < 0)
    projected = jax.lax.cond(
        violates,
        lambda: gem_project(grad_flat, mem_grads, margin),
        lambda: grad_flat.astype(jnp.float32))
    return projected, violates
