"""Sweep GEM's mem_batch chunk size at the protocol point (r1 weak #7).

mem_batch does NOT change which exemplars are replayed (the full buffer's
mean gradient is always used, chunk-size invariant — methods/rehearsal.py
GEMRule._memory_grads); it only sets the scan-chunk granularity of the
vmapped memory-grad sweep. Bigger chunks = fewer, larger fused launches
at the cost of peak activation memory.

Run: python scripts/bench_gem_sweep.py [mem_batch ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_gem(mem_batch: int) -> float:
    """One protocol-point measurement, sharing bench.py's _bench_gem so
    the sweep can never drift from the headline bench's GEM workload."""
    import bench

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (20000, 64, 64, 3),
                                      np.uint8))
    labels = jnp.asarray(rng.integers(0, 20, (20000,), np.int32))
    spec = _spec()
    return bench._bench_gem(spec, images, labels, mem_batch=mem_batch)


def _spec():
    from clsurvey_tpu.models.registry import ModelSpec

    return ModelSpec(
        name="small_VGG9_cl_128_128", arch="small_VGG9",
        input_size=(64, 64), classifier_dims=(128, 128),
        models_root_path="/tmp/bench_models", compute_dtype=jnp.bfloat16)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [128, 256, 512, 1024]
    for mb in sizes:
        try:
            r = bench_gem(mb)
            print(f"mem_batch={mb:5d}  {r:9.1f} img/s")
        except Exception as e:  # OOM at big chunks is an acceptable answer
            print(f"mem_batch={mb:5d}  FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
