"""Microbench: strategies for gathering shuffled uint8 rows on TPU.

The resident-data epoch gathers `bs` random rows per step from an
(n, H, W, 3) uint8 array. The one-hot bf16 matmul workaround (r1) is
exact and fast vs jnp.take, but costs 2*bs*n*rowbytes FLOPs — at
n=20k/64px that's ~98 GFLOP per batch, on par with small_VGG9's own
fwd+bwd. Candidates:

  onehot      one-hot bf16 matmul (r1 baseline)
  take_u8     jnp.take on the uint8 array
  take_i32    bitcast rows to int32 (4x fewer lanes), take, bitcast back
  slice       contiguous dynamic_slice (no shuffle) — speed-of-light ref

Run: python scripts/bench_gather.py [n] [bs] [px]
(px*px*3 must be divisible by 4 for the int32 bitcast variant)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    px = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    row = px * px * 3
    if row % 4:
        sys.exit(f"px={px}: row bytes {row} not divisible by 4 — the "
                 f"int32-bitcast variant needs 4-byte-aligned rows")
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (n, px, px, 3), np.uint8))
    images_i32 = jax.lax.bitcast_convert_type(
        images.reshape(n, row // 4, 4), jnp.int32)
    steps = 50

    def run(name, fn, *args):
        out = fn(*args)                      # compile
        _ = float(out)  # forced host read: tunnel async dispatch
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = float(out)
            best = min(best, time.perf_counter() - t0)
        per_batch_ms = best / steps * 1e3
        print(f"{name:10s} {per_batch_ms:8.3f} ms/batch "
              f"({steps} batches of {bs} rows from n={n})")
        return per_batch_ms

    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (steps, bs), 0, n)

    @jax.jit
    def onehot(images, idx):
        def body(acc, i):
            oh = jax.nn.one_hot(i, n, dtype=jnp.bfloat16)
            out = oh @ images.reshape(n, -1).astype(jnp.bfloat16)
            return acc + jnp.tanh(out).sum(), None
        return jax.lax.scan(body, jnp.bfloat16(0), idx)[0]

    @jax.jit
    def take_u8(images, idx):
        def body(acc, i):
            out = jnp.take(images, i, axis=0)
            return acc + jnp.tanh(out.astype(jnp.bfloat16)).sum(), None
        return jax.lax.scan(body, jnp.bfloat16(0), idx)[0]

    @jax.jit
    def take_i32(images_i32, idx):
        def body(acc, i):
            out = jnp.take(images_i32, i, axis=0)
            u8 = jax.lax.bitcast_convert_type(out, jnp.uint8)
            return acc + jnp.tanh(u8.astype(jnp.bfloat16)).sum(), None
        return jax.lax.scan(body, jnp.bfloat16(0), idx)[0]

    @jax.jit
    def slice_seq(images):
        def body(acc, k):
            out = jax.lax.dynamic_slice_in_dim(images, k * bs, bs)
            return acc + jnp.tanh(out.astype(jnp.bfloat16)).sum(), None
        return jax.lax.scan(body, jnp.bfloat16(0),
                            jnp.arange(steps) % (n // bs))[0]

    run("onehot", onehot, images, idx)
    run("take_u8", take_u8, images, idx)
    run("take_i32", take_i32, images_i32, idx)
    run("slice", slice_seq, images)


if __name__ == "__main__":
    main()
