"""Capture a jax.profiler trace of the flagship train epoch and print a
per-op time breakdown (top HLO ops by self-time).

The trace is written under /tmp/clsurvey_trace; the breakdown is parsed
from the xplane proto via tensorboard_plugin_profile's converter, so no
TensorBoard UI is needed.

Run: python scripts/profile_step.py [bs]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

TRACE_DIR = "/tmp/clsurvey_trace"


def capture(bs: int) -> None:
    from clsurvey_tpu.engine.train import (
        Engine, TrainState, make_context, tree_zeros_like)
    from clsurvey_tpu.methods.base import UpdateRule
    from clsurvey_tpu.models.registry import init_model_state, ModelSpec

    n = 20000
    spec = ModelSpec(
        name="small_VGG9_cl_128_128", arch="small_VGG9",
        input_size=(64, 64), classifier_dims=(128, 128),
        models_root_path="/tmp/bench_models", compute_dtype=jnp.bfloat16)
    sd = init_model_state(spec, jax.random.PRNGKey(0), max_tasks=10,
                          classes_per_task=20)
    ctx = make_context(
        spec, task=0, n_tasks=1, class_counts=[20] * 10,
        mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
        update_rule=UpdateRule(), augment=True)
    engine = Engine(ctx)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (n, 64, 64, 3), np.uint8))
    labels = jnp.asarray(rng.integers(0, 20, (n,), np.int32))
    key = jax.random.PRNGKey(1)

    def fresh_state():
        tr = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True),
            {"params": sd["params"],
             "heads": {"kernel": sd["heads"]["kernel"],
                       "bias": sd["heads"]["bias"]}})
        return TrainState(tr, {}, tree_zeros_like(tr),
                          UpdateRule().init_state(tr, {}, ctx))

    perm = jax.random.permutation(key, n)
    state = fresh_state()
    _, m = engine.train_epoch(state, images, labels, perm, key, 5e-3, bs)
    _ = float(m["loss"])  # compile + sync

    state = fresh_state()
    with jax.profiler.trace(TRACE_DIR):
        _, m = engine.train_epoch(state, images, labels, perm, key,
                                  5e-3, bs)
        _ = float(m["loss"])


def report() -> None:
    files = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not files:
        print("no xplane capture found", file=sys.stderr)
        return
    xplane = files[-1]
    from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t

    data, _ = r2t.xspace_to_tool_data([xplane], "op_profile", {})
    prof = json.loads(data)

    def walk(node, depth, out):
        m = node.get("metrics", {})
        name = node.get("name", "?")
        t = m.get("time", 0.0)
        out.append((t, depth, name, m.get("flops", 0.0),
                    m.get("memoryBandwidth", 0.0)))
        for c in node.get("children", []):
            walk(c, depth + 1, out)

    root = prof.get("byProgram", prof.get("byCategory", {}))
    out: list = []
    walk(root, 0, out)
    # top self-time leaves (depth >= 2 are op categories/instructions)
    leaves = [o for o in out if o[1] >= 2]
    leaves.sort(reverse=True)
    print(f"{'time%':>7} {'flops%':>7} {'GB/s':>8}  op")
    for t, d, name, fl, bw in leaves[:25]:
        print(f"{100 * t:7.2f} {100 * fl:7.2f} {bw:8.1f}  {name[:90]}")


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    if os.environ.get("REPORT_ONLY") != "1":
        capture(bs)
    report()
