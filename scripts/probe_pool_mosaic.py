"""Fast real-TPU Mosaic compile + parity probe for ops/pool_pallas.py.

The CPU test suite runs the kernels in interpret mode, which skips
Mosaic lowering entirely — the r2 relay outage taught us those tests
can pass while the kernel fails `infer-vector-layout` on hardware
(docs/PERF.md). This probe compiles and runs fwd+VJP at every
small_VGG9 pool stage shape on the real chip and asserts exact parity
with XLA select-and-scatter, in ~2 minutes — run it before spending
chip time on the full `scripts/bench_pool.py` A/B.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from clsurvey_tpu.ops import pool_pallas

STAGE_SHAPES = [  # small_VGG9 (64,'M',64,'M',64,64,'M',128,128,'M') @64px
    (8, 64, 64, 64), (8, 32, 32, 64), (8, 16, 16, 64), (8, 8, 8, 128)]


def _xla_pool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    ok = True
    for shape in STAGE_SHAPES:
        for dtype in (jnp.float32, jnp.bfloat16):
            # small integers force in-window ties: exercises tie-breaks
            x = jax.random.randint(
                jax.random.PRNGKey(0), shape, 0, 3).astype(dtype)
            try:
                f_ours = jax.jit(jax.value_and_grad(
                    lambda t: jnp.sum(
                        pool_pallas.maxpool2x2(t).astype(jnp.float32))))
                f_xla = jax.jit(jax.value_and_grad(
                    lambda t: jnp.sum(_xla_pool(t).astype(jnp.float32))))
                (v1, g1), (v2, g2) = f_ours(x), f_xla(x)
                np.testing.assert_array_equal(np.asarray(g1, np.float32),
                                              np.asarray(g2, np.float32))
                assert float(v1) == float(v2)
                print(f"  {shape} {jnp.dtype(dtype).name}: OK")
            except Exception as e:  # noqa: BLE001 — report every stage
                ok = False
                msg = str(e).splitlines()[:3]
                print(f"  {shape} {jnp.dtype(dtype).name}: FAIL {msg}")
    print("PROBE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
