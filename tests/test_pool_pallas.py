"""Fused Pallas 2x2 max-pool: forward + VJP parity with XLA
(select-and-scatter), including tie-break semantics (docs/PERF.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clsurvey_tpu.ops import pool_pallas


def _xla_pool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


SHAPES = [(4, 8, 8, 64), (3, 16, 16, 128), (2, 64, 64, 64)]


@pytest.mark.smoke  # on TPU this exercises the real Mosaic compile
@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_xla(shape, dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype)
    got = pool_pallas.maxpool2x2(x)
    want = _xla_pool(x)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


@pytest.mark.smoke
@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_vjp_matches_xla_including_ties(shape, dtype):
    # small-integer values force frequent in-window ties: the argmax
    # routing must break them exactly like select-and-scatter's GE select
    # (first max in window row-major order). bf16 is the riskier dtype:
    # argmax codes and lane iota are stored in the input dtype.
    key = jax.random.PRNGKey(1)
    x = jax.random.randint(key, shape, 0, 3).astype(dtype)
    w = jax.random.normal(jax.random.fold_in(key, 1),
                          (shape[0], shape[1] // 2, shape[2] // 2,
                           shape[3]), dtype)

    def cast_sum(pool):
        return lambda t: jnp.sum((pool(t) * w).astype(jnp.float32))

    g_ours = jax.grad(cast_sum(pool_pallas.maxpool2x2))(x)
    g_xla = jax.grad(cast_sum(_xla_pool))(x)
    np.testing.assert_array_equal(np.asarray(g_ours, np.float32),
                                  np.asarray(g_xla, np.float32))


def test_vjp_matches_on_random_floats():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 64))
    g_ours = jax.grad(lambda t: jnp.sum(pool_pallas.maxpool2x2(t) ** 2))(x)
    g_xla = jax.grad(lambda t: jnp.sum(_xla_pool(t) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_xla),
                               rtol=1e-6, atol=1e-6)


def test_supported_gate():
    assert pool_pallas.supported((4, 8, 8, 64))
    assert not pool_pallas.supported((4, 7, 8, 64))   # odd H
    assert not pool_pallas.supported((4, 8, 9, 64))   # odd W
    assert not pool_pallas.supported((4, 8, 8, 3))    # lanes misaligned
    assert not pool_pallas.supported((8, 8, 64))      # not 4-D


def test_pool2x2_dispatch_equivalence(monkeypatch):
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 64))
    monkeypatch.delenv("CLSURVEY_PALLAS_POOL", raising=False)
    off = pool_pallas.pool2x2(x)
    monkeypatch.setenv("CLSURVEY_PALLAS_POOL", "1")
    on = pool_pallas.pool2x2(x)
    np.testing.assert_array_equal(np.asarray(off), np.asarray(on))
    # unsupported shapes silently fall back to XLA even when enabled
    odd = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 6, 3))
    np.testing.assert_array_equal(
        np.asarray(pool_pallas.pool2x2(odd)), np.asarray(_xla_pool(odd)))
