"""Golden tests for the GEM QP solvers (SURVEY §7 hard-part 1).

Three-way agreement: jitted JAX PDAS == native C++ PDAS == brute-force
active-set enumeration (exact for small t)."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from clsurvey_tpu.ops import qp as qp_jax
from clsurvey_tpu.ops import qp_native


def brute_force_bound_qp(P, q, lb):
    """Exact solution by enumerating all active sets (t <= ~12)."""
    t = len(q)
    best_v, best_f = None, np.inf
    for mask in itertools.product([0, 1], repeat=t):
        active = np.asarray(mask, bool)
        free = ~active
        v = np.array(lb, np.float64)
        if free.any():
            Pff = P[np.ix_(free, free)]
            rhs = q[free] - P[np.ix_(free, active)] @ lb[active]
            try:
                v[free] = np.linalg.solve(Pff, rhs)
            except np.linalg.LinAlgError:
                continue
        if np.any(v < lb - 1e-9):
            continue  # infeasible
        mu = P @ v - q
        if np.any(mu[active] < -1e-9):
            continue  # KKT violated
        f = 0.5 * v @ P @ v - q @ v
        if f < best_f:
            best_f, best_v = f, v
    return best_v


def _random_problem(rng, t, p=50, margin=0.5):
    M = rng.normal(0, 1, (t, p))
    g = rng.normal(0, 1, p)
    P = M @ M.T
    P = 0.5 * (P + P.T) + np.eye(t) * 1e-3
    q = M @ g
    lb = np.full(t, margin)
    return M, g, P, q, lb


@pytest.mark.parametrize("t", [1, 2, 4, 8])
def test_three_way_agreement(t):
    rng = np.random.default_rng(t)
    for trial in range(5):
        _, _, P, q, lb = _random_problem(rng, t)
        v_exact = brute_force_bound_qp(P, q, lb)
        v_jax = np.asarray(qp_jax.solve_bound_qp(
            jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
            jnp.asarray(lb, jnp.float32)))
        np.testing.assert_allclose(v_jax, v_exact, rtol=2e-3, atol=2e-3)
        if qp_native.available():
            v_cpp = qp_native.solve_bound_qp(P, q, lb)
            np.testing.assert_allclose(v_cpp, v_exact, rtol=1e-8,
                                       atol=1e-8)


def test_native_builds():
    assert qp_native.available(), (
        "native QP library failed to build — check `make -C native`")


@pytest.mark.parametrize("t", [3, 10, 25, 39])
def test_jax_matches_native_larger(t):
    """Beyond brute-force range: JAX vs C++ on GEM-realistic sizes."""
    if not qp_native.available():
        pytest.skip("no native lib")
    rng = np.random.default_rng(100 + t)
    M, g, P, q, lb = _random_problem(rng, t, p=200, margin=1.0)
    v_cpp = qp_native.solve_bound_qp(P, q, lb)
    v_jax = np.asarray(qp_jax.solve_bound_qp(
        jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
        jnp.asarray(lb, jnp.float32)))
    np.testing.assert_allclose(v_jax, v_cpp, rtol=5e-3, atol=5e-3)
    # end-to-end projection agreement
    x_cpp = qp_native.gem_project(M, g, margin=1.0)
    x_jax = np.asarray(qp_jax.gem_project(
        jnp.asarray(g, jnp.float32), jnp.asarray(M, jnp.float32),
        jnp.float32(1.0)))
    np.testing.assert_allclose(x_jax, x_cpp, rtol=5e-3, atol=5e-3)


@pytest.mark.smoke
def test_projection_fixes_violations():
    """Projected gradient satisfies <x, g_mem> >= 0 for every memory."""
    rng = np.random.default_rng(0)
    M, g, *_ = _random_problem(rng, 6, p=100)
    # ensure violation exists
    M[0] = -g + rng.normal(0, 0.1, g.shape)
    x, violated = qp_jax.gem_project_if_violating(
        jnp.asarray(g, jnp.float32), jnp.asarray(M, jnp.float32),
        jnp.float32(0.5))
    assert bool(violated)
    dots = np.asarray(M @ np.asarray(x))
    assert np.all(dots >= -1e-2), dots


def test_no_projection_when_agreeing():
    rng = np.random.default_rng(1)
    g = rng.normal(0, 1, 50)
    M = np.stack([g + rng.normal(0, 0.01, 50) for _ in range(3)])
    x, violated = qp_jax.gem_project_if_violating(
        jnp.asarray(g, jnp.float32), jnp.asarray(M, jnp.float32),
        jnp.float32(0.5))
    assert not bool(violated)
    np.testing.assert_allclose(np.asarray(x), g, rtol=1e-6)
