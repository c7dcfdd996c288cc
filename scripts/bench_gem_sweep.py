"""Sweep GEM's mem_batch chunk size at the protocol point (r1 weak #7).

mem_batch does NOT change which exemplars are replayed (the full buffer's
mean gradient is always used, chunk-size invariant — methods/rehearsal.py
GEMRule._memory_grads); it only sets the scan-chunk granularity of the
vmapped memory-grad sweep. Bigger chunks = fewer, larger fused launches
at the cost of peak activation memory.

Run: python scripts/bench_gem_sweep.py [mem_batch ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_gem(mem_batch: int) -> float:
    from clsurvey_tpu.engine.train import (
        Engine, TrainState, make_context, tree_zeros_like)
    from clsurvey_tpu.methods.rehearsal import (
        GEMRule, fresh_task_memory, fill_buffer_from_data)
    from clsurvey_tpu.models.registry import init_model_state, ModelSpec

    spec = ModelSpec(
        name="small_VGG9_cl_128_128", arch="small_VGG9",
        input_size=(64, 64), classifier_dims=(128, 128),
        models_root_path="/tmp/bench_models", compute_dtype=jnp.bfloat16)
    sd = init_model_state(spec, jax.random.PRNGKey(3), max_tasks=10,
                          classes_per_task=20)
    rule = GEMRule(n_memories=1024, mem_batch=mem_batch)
    ctx = make_context(
        spec, task=4, n_tasks=5, class_counts=[20] * 10,
        mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
        update_rule=rule, augment=True)
    engine = Engine(ctx)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (4096, 64, 64, 3), np.uint8))
    labels = jnp.asarray(rng.integers(0, 20, (4096,), np.int32))
    mem = fresh_task_memory(10, 1024, spec.input_size)
    host_imgs = np.asarray(images)
    host_lbls = np.asarray(labels)
    for t in range(4):
        mem = fill_buffer_from_data(mem, t, host_imgs, host_lbls, seed=t)
    tr = {"params": sd["params"],
          "heads": {"kernel": sd["heads"]["kernel"],
                    "bias": sd["heads"]["bias"]}}
    state = TrainState(tr, {}, tree_zeros_like(tr),
                       rule.init_state(tr, {"margin": 0.5}, ctx, memory=mem))
    bs = 200
    n = 2000
    key = jax.random.PRNGKey(5)
    perm = jax.random.permutation(key, n)
    state, m = engine.train_epoch(state, images[:n], labels[:n], perm, key,
                                  5e-3, bs)
    _ = float(m["loss"])  # compile + sync
    best = float("inf")
    for e in range(3):
        ekey = jax.random.fold_in(key, e)
        perm = jax.random.permutation(ekey, n)
        t0 = time.perf_counter()
        state, m = engine.train_epoch(state, images[:n], labels[:n], perm,
                                      ekey, 5e-3, bs)
        _ = float(m["loss"])
        best = min(best, time.perf_counter() - t0)
    return n / best


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
