"""Ablate the train-step cost on TPU: where do the ms/batch go?

Times full epochs (forced host read per epoch) with pieces removed:
  full        the real train step (gather + preprocess + fwd/bwd + SGD)
  noaug       augment=False (no flip + no per-batch bernoulli)
  fwdbwd      value_and_grad only — contiguous slices, no aug, no
              momentum/update/metrics (so full-noaug-fwdbwd conflates
              the gather AND the update; per-gather numbers come from
              scripts/bench_gather.py)
  fwd         forward + loss only (same caveats; also lets XLA DCE some
              weight-gradients — a lower bound, not a budget line)
Run: python scripts/bench_ablate.py [bs]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from clsurvey_tpu.engine.train import (
        Engine, TrainState, make_context, tree_zeros_like)
    from clsurvey_tpu.methods.base import UpdateRule
    from clsurvey_tpu.models.registry import init_model_state, ModelSpec
    from clsurvey_tpu.ops import preprocess as pp

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    n = 20000
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

    def time_epoch(fn, *args):
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = float("inf")
        for _i in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best / steps * 1e3

    def engine_epoch(augment):
        ctx = make_context(
            spec, task=0, n_tasks=1, class_counts=[20] * 10,
            mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
            update_rule=UpdateRule(), augment=augment)
        engine = Engine(ctx)
        tr = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True),
            {"params": sd["params"],
             "heads": {"kernel": sd["heads"]["kernel"],
                       "bias": sd["heads"]["bias"]}})
        state = TrainState(tr, {}, tree_zeros_like(tr),
                           UpdateRule().init_state(tr, {}, ctx))
        perm = jax.random.permutation(key, n)

        def run(state):
            st, m = engine.train_epoch(state, images, labels, perm, key,
                                       5e-3, bs)
            return m["loss"]
        # donation: rebuild state each call
        out = run(state)
        _ = float(out)
        best = float("inf")
        for _i in range(3):
            tr = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True),
                {"params": sd["params"],
                 "heads": {"kernel": sd["heads"]["kernel"],
                           "bias": sd["heads"]["bias"]}})
            state = TrainState(tr, {}, tree_zeros_like(tr),
                               UpdateRule().init_state(tr, {}, None))
            t0 = time.perf_counter()
            _ = float(run(state))
            best = min(best, time.perf_counter() - t0)
        return best / steps * 1e3

    print(f"full       {engine_epoch(True):7.3f} ms/batch")
    print(f"noaug      {engine_epoch(False):7.3f} ms/batch")

    # hand-rolled scans without the engine
    backbone = spec.make_backbone()
    from clsurvey_tpu.models import heads as heads_lib
    bank_cc = np.full(10, 20, np.int32)
    params = jax.tree_util.tree_map(jnp.asarray, sd["params"])
    kernel = jnp.asarray(sd["heads"]["kernel"])
    bias = jnp.asarray(sd["heads"]["bias"])
    import optax

    def loss_fn(p, k, b, x, y):
        feats = backbone.apply({"params": p}, x, train=True)
        bank = {"kernel": k, "bias": b, "class_counts": bank_cc}
        logits = heads_lib.forward(bank, feats, 0)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    @jax.jit
    def fwd_epoch(params, kernel, bias):
        def body(acc, i):
            x = jax.lax.dynamic_slice_in_dim(images, i * bs, bs)
            x = pp.preprocess(key, x, (0.485, 0.456, 0.406),
                              (0.229, 0.224, 0.225), False,
                              dtype=jnp.bfloat16)
            y = jax.lax.dynamic_slice_in_dim(labels, i * bs, bs)
            return acc + loss_fn(params, kernel, bias, x, y), None
        return jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))[0]

    @jax.jit
    def fwdbwd_epoch(params, kernel, bias):
        def body(acc, i):
            x = jax.lax.dynamic_slice_in_dim(images, i * bs, bs)
            x = pp.preprocess(key, x, (0.485, 0.456, 0.406),
                              (0.229, 0.224, 0.225), False,
                              dtype=jnp.bfloat16)
            y = jax.lax.dynamic_slice_in_dim(labels, i * bs, bs)
            g = jax.grad(loss_fn)(params, kernel, bias, x, y)
            return acc + jax.tree_util.tree_leaves(g)[0].sum(), None
        return jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))[0]

    print(f"fwd        {time_epoch(fwd_epoch, params, kernel, bias):7.3f}"
          f" ms/batch")
    print(f"fwdbwd     {time_epoch(fwdbwd_epoch, params, kernel, bias):7.3f}"
          f" ms/batch")


if __name__ == "__main__":
    main()
