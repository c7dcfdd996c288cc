"""Decide Pallas fused max-pool adoption on real TPU (docs/PERF.md).

Two measurements:

1. Isolated pool fwd+bwd at each small_VGG9 stage shape: XLA
   select-and-scatter vs the argmax-routed Pallas pair
   (ops/pool_pallas.py). Isolated wins can still lose end-to-end if the
   kernel boundary forces relayouts of the batch-minor conv activations.
2. The full flagship train epoch with CLSURVEY_PALLAS_POOL off vs on —
   the number that decides (the env gate is read at trace time, so a
   fresh Engine per setting retraces with the chosen kernels).

Run: python scripts/bench_pool.py [bs] [--n N] [--iters I] [--reps R]
(the size flags exist so the full code path can be sanity-run on CPU
with tiny shapes before an unattended TPU run)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

STAGE_SHAPES = [  # small_VGG9 (64,'M',64,'M',64,64,'M',128,128,'M') @64px
    (64, 64, 64), (32, 32, 64), (16, 16, 64), (8, 8, 128)]


def _xla_pool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def time_fn(fn, *args, reps=3):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    best = float("inf")
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def isolated(bs, iters=50, reps=3):
    from clsurvey_tpu.ops import pool_pallas

    print(f"== isolated pool fwd+bwd, bs={bs}, bf16, {iters} iters ==")
    for h, w, c in STAGE_SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (bs, h, w, c),
                              jnp.bfloat16)

        def make(pool):
            @jax.jit
            def run(x0):
                def body(i, acc):
                    xi = x0 + acc * jnp.bfloat16(1e-6)  # defeat hoisting
                    g = jax.grad(
                        lambda t: jnp.sum(pool(t).astype(jnp.float32)))(xi)
                    return acc + jnp.sum(g[0, 0, 0, :8].astype(jnp.float32))
                return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
            return run

        t_xla = time_fn(make(_xla_pool), x, reps=reps) / iters * 1e3
        t_pal = time_fn(make(pool_pallas.maxpool2x2), x,
                        reps=reps) / iters * 1e3
        print(f"  ({bs},{h},{w},{c}): xla {t_xla:7.3f} ms  "
              f"pallas {t_pal:7.3f} ms  ({t_xla / t_pal:4.2f}x)")


def full_step(bs, n=20000, reps=5):
    from clsurvey_tpu.engine.train import (
        Engine, TrainState, make_context, tree_zeros_like)
    from clsurvey_tpu.methods.base import UpdateRule
    from clsurvey_tpu.models.registry import init_model_state, ModelSpec

    spec = ModelSpec(
        name="small_VGG9_cl_128_128", arch="small_VGG9",
        input_size=(64, 64), classifier_dims=(128, 128),
        models_root_path="/tmp/bench_models", compute_dtype=jnp.bfloat16)
    sd = init_model_state(spec, jax.random.PRNGKey(0), max_tasks=10,
                          classes_per_task=20)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (n, 64, 64, 3), np.uint8))
    labels = jnp.asarray(rng.integers(0, 20, (n,), np.int32))
    key = jax.random.PRNGKey(1)
    steps = n // bs
    print(f"== full flagship epoch, bs={bs} ==")
    results = {}
    for setting in ("off", "on"):
        if setting == "on":
            os.environ["CLSURVEY_PALLAS_POOL"] = "1"
        else:
            os.environ.pop("CLSURVEY_PALLAS_POOL", None)
        ctx = make_context(
            spec, task=0, n_tasks=1, class_counts=[20] * 10,
            mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
            update_rule=UpdateRule(), augment=True)
        engine = Engine(ctx)  # fresh jit per setting -> env re-read

        def fresh_state():
            tr = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True),
                {"params": sd["params"],
                 "heads": {"kernel": sd["heads"]["kernel"],
                           "bias": sd["heads"]["bias"]}})
            return TrainState(tr, {}, tree_zeros_like(tr),
                              UpdateRule().init_state(tr, {}, ctx))

        perm = jax.random.permutation(key, n)

        def run():
            _, m = engine.train_epoch(fresh_state(), images, labels, perm,
                                      key, 5e-3, bs)
            return m["loss"]

        best = time_fn(run, reps=reps)
        per_batch = best / steps * 1e3
        results[setting] = per_batch
        print(f"  pallas_pool={setting}: {per_batch:7.3f} ms/batch "
              f"({bs / (best / steps):,.0f} img/s)")
    won = results["on"] < results["off"]
    print(f"VERDICT: pallas pool {'WINS' if won else 'loses'} "
          f"({results['off']:.3f} -> {results['on']:.3f} ms/batch)")


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("bs", nargs="?", type=int, default=200)
    ap.add_argument("--n", type=int, default=20000,
                    help="full-epoch dataset rows")
    ap.add_argument("--iters", type=int, default=50,
                    help="isolated fori_loop iterations")
    ap.add_argument("--reps", type=int, default=None,
                    help="best-of repetitions (default 3 isolated/5 full)")
    a = ap.parse_args()
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    isolated(a.bs, iters=a.iters, reps=a.reps or 3)
    full_step(a.bs, n=a.n, reps=a.reps or 5)


if __name__ == "__main__":
    main()
