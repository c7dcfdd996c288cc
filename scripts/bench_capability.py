"""Capability table: flagship-step throughput + MFU across batch sizes.

The bench protocol point is bs=200 (the reference's timing_mode batch,
ref:src/framework/main.py:289-300), which wastes 22% of the 128-wide
vector lanes (batch rides the lane dim in XLA's chosen conv layouts —
docs/PERF.md). This sweep documents what the same compiled step delivers
when the protocol constraint is lifted: bs 200 / 256 / 512.

Run (TPU): python scripts/bench_capability.py
Writes docs/capability.json + prints one row per batch size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BATCHES = (200, 256, 512)
V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import vgg_train_flops_per_img
    from clsurvey_tpu.engine.train import (
        Engine, TrainState, make_context, tree_zeros_like)
    from clsurvey_tpu.methods.base import UpdateRule
    from clsurvey_tpu.models.registry import init_model_state, ModelSpec

    n_train = 20480  # divisible by every batch size tested
    spec = ModelSpec(
        name="small_VGG9_cl_128_128", arch="small_VGG9",
        input_size=(64, 64), classifier_dims=(128, 128),
        models_root_path="/tmp/bench_models", compute_dtype=jnp.bfloat16)
    state_dict = init_model_state(spec, jax.random.PRNGKey(0), max_tasks=10,
                                  classes_per_task=20)
    ctx = make_context(
        spec, task=0, n_tasks=1, class_counts=[20] * 10,
        mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
        update_rule=UpdateRule(), augment=True)
    engine = Engine(ctx)
    rule = UpdateRule()
    trainable = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True),
        {"params": state_dict["params"],
         "heads": {"kernel": state_dict["heads"]["kernel"],
                   "bias": state_dict["heads"]["bias"]}})
    state = TrainState(trainable, {}, tree_zeros_like(trainable),
                       rule.init_state(trainable, {}, ctx))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (n_train, 64, 64, 3),
                                      dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 20, (n_train,), dtype=np.int32))
    key = jax.random.PRNGKey(1)
    flops_img = vgg_train_flops_per_img("small_VGG9", (128, 128), 64, 20)

    rows = []
    for bs in BATCHES:
        perm = jax.random.permutation(jax.random.fold_in(key, bs), n_train)
        state, m = engine.train_epoch(state, images, labels, perm, key,
                                      5e-3, bs)
        _ = float(m["loss"])  # compile + forced host sync
        best = float("inf")
        for e in range(4):
            ekey = jax.random.fold_in(key, 1000 * bs + e)
            perm = jax.random.permutation(ekey, n_train)
            t0 = time.perf_counter()
            state, m = engine.train_epoch(state, images, labels, perm,
                                          ekey, 5e-3, bs)
            _ = float(m["loss"])
            best = min(best, time.perf_counter() - t0)
        n_used = (n_train // bs) * bs
        ips = n_used / best
        row = {
            "batch_size": bs,
            "imgs_per_sec": round(ips, 1),
            "step_ms": round(1000.0 * bs / ips, 3),
            "mfu_pct": round(
                100.0 * ips * flops_img / (V5E_BF16_PEAK_TFLOPS * 1e12), 2),
        }
        rows.append(row)
        print(json.dumps(row))

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "capability.json")
    with open(out, "w") as f:
        json.dump({"model": spec.name, "px": 64, "dtype": "bfloat16",
                   "protocol_bs": 200, "rows": rows}, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
