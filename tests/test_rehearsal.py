"""GEM / iCaRL / replay-baseline tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clsurvey_tpu.methods.rehearsal import (
    fresh_task_memory, ring_buffer_update, fill_buffer_from_data)
from clsurvey_tpu.ops import herding as herd_lib


def test_ring_buffer_fill_and_wrap():
    mem = fresh_task_memory(n_tasks=2, n_memories=8, input_size=(4, 4))
    x = jnp.ones((5, 4, 4, 3), jnp.uint8) * 7
    y = jnp.arange(5)
    mem = ring_buffer_update(mem, 0, x, y)
    assert int(mem["mem_cnt"]) == 5
    assert int(mem["mem_count"][0]) == 5
    np.testing.assert_array_equal(np.asarray(mem["mem_labels"][0][:5]),
                                  np.arange(5))
    # second batch: only 3 slots fit; counter wraps to 0 (ref ring buffer)
    x2 = jnp.ones((5, 4, 4, 3), jnp.uint8) * 9
    y2 = jnp.arange(5) + 10
    mem = ring_buffer_update(mem, 0, x2, y2)
    assert int(mem["mem_cnt"]) == 0  # wrapped
    assert int(mem["mem_count"][0]) == 8
    np.testing.assert_array_equal(np.asarray(mem["mem_labels"][0][5:8]),
                                  [10, 11, 12])
    # next batch starts overwriting from 0
    x3 = jnp.ones((2, 4, 4, 3), jnp.uint8)
    y3 = jnp.asarray([99, 98])
    mem = ring_buffer_update(mem, 0, x3, y3)
    np.testing.assert_array_equal(np.asarray(mem["mem_labels"][0][:2]),
                                  [99, 98])


def test_fill_buffer_from_data():
    mem = fresh_task_memory(2, 4, (4, 4))
    images = np.arange(6 * 48, dtype=np.uint8).reshape(6, 4, 4, 3)
    labels = np.arange(6, dtype=np.int32)
    mem = fill_buffer_from_data(mem, 0, images, labels, seed=3)
    assert int(mem["mem_count"][0]) == 4
    stored = set(np.asarray(mem["mem_labels"][0][:4]).tolist())
    assert stored.issubset(set(range(6))) and len(stored) == 4


def _naive_herd(features, k):
    """Direct transcription of the reference's greedy selection
    (ref:icarl.py:394-471)."""
    n = len(features)
    mean = features.mean(0)
    taken = np.zeros(n, bool)
    prev_sum = np.zeros(features.shape[1])
    order = []
    for ex in range(k):
        cost = np.linalg.norm(
            mean[None] - (features + prev_sum[None]) / (ex + 1), axis=1)
        cost[taken] = np.inf
        win = int(np.argmin(cost))
        taken[win] = True
        prev_sum += features[win]
        order.append(win)
    return order


def test_herding_matches_reference_greedy():
    rng = np.random.default_rng(0)
    feats = rng.normal(0, 1, (40, 16)).astype(np.float32)
    order_ref = _naive_herd(feats, 10)
    order_jax = np.asarray(herd_lib.herd(
        jnp.asarray(feats), jnp.ones(40, jnp.float32), 10)).tolist()
    assert order_jax == order_ref


def test_class_means():
    feats = jnp.asarray([[1.0, 0], [3.0, 0], [0, 2.0]])
    labels = jnp.asarray([0, 0, 1])
    means, counts = herd_lib.class_means(feats, labels, 3)
    np.testing.assert_allclose(np.asarray(means[0]), [2.0, 0])
    np.testing.assert_allclose(np.asarray(means[1]), [0, 2.0])
    np.testing.assert_allclose(np.asarray(counts), [2, 1, 0])


COMMON = dict(
    model_name="tiny_CNN_cl_32_32",
    ds_name="synthetic_2t_4c_32px",
    num_epochs=4, batch_size=32, lr_grid=(1e-2,),
    gridsearch_name="testgrid", max_attempts_per_task=2,
)


def _dump_base(run_main, RunArgs):
    run_main(RunArgs(method_name="SI",
                     runmode="first_task_basemodel_dump", **COMMON))


def test_gem_sequence(fresh_config):
    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main
    from clsurvey_tpu.utils import io

    _dump_base(run_main, RunArgs)
    manager = run_main(RunArgs(method_name="GEM", test=True,
                               static_hyperparams="16", **COMMON))
    best = io.load(manager.previous_task_model_path)
    assert "method_aux" in best and "memory" in best["method_aux"]
    mem = best["method_aux"]["memory"]
    assert int(mem["mem_count"][0]) == 16  # task-1 buffer filled
    assert int(mem["mem_count"][1]) > 0    # task-2 ring buffer ran
    from clsurvey_tpu.utils import paths as paths_lib

    out_dir = paths_lib.get_test_results_path(
        COMMON["ds_name"], "GEM", COMMON["model_name"], "testgrid",
        manager.exp_name, create=False)
    from tests.helpers import load_seq_res

    assert len(load_seq_res(out_dir, "GEM", 1)) == 2


def test_rehearsal_baseline_partial(fresh_config):
    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main
    from clsurvey_tpu.utils import io, paths as paths_lib

    manager = run_main(RunArgs(
        method_name="finetuning_rehearsal_partial_mem", test=True,
        static_hyperparams="16", **COMMON))
    out_dir = paths_lib.get_test_results_path(
        COMMON["ds_name"], "finetuning_rehearsal_partial_mem",
        COMMON["model_name"], "testgrid", manager.exp_name, create=False)
    from tests.helpers import load_seq_res

    seq = load_seq_res(out_dir, "finetuning_rehearsal_partial_mem", 1)
    assert len(seq) == 2
    assert seq[0] > 50.0


def test_icarl_sequence(fresh_config):
    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main
    from clsurvey_tpu.utils import io, paths as paths_lib

    _dump_base(run_main, RunArgs)
    manager = run_main(RunArgs(method_name="ICARL", test=True,
                               static_hyperparams="8", **COMMON))
    best = io.load(manager.previous_task_model_path)
    assert "method_aux" in best and "exemplars" in best["method_aux"]
    ex = best["method_aux"]["exemplars"]
    assert int(ex["count"]) > 0
    # exemplars cover classes of both tasks (shared head indices)
    labels = np.asarray(ex["labels"])[:int(ex["count"])]
    assert labels.max() >= 4  # second task's shared class indices
    out_dir = paths_lib.get_test_results_path(
        COMMON["ds_name"], "ICARL", COMMON["model_name"], "testgrid",
        manager.exp_name, create=False)
    from tests.helpers import load_seq_res

    seq = load_seq_res(out_dir, "ICARL", 1)
    assert len(seq) == 2
    # NCM eval should be strong on this easy data
    assert seq[0] > 50.0


def test_gem_memory_grads_chunk_invariant(fresh_config):
    """The memory gradient is the exact full-buffer mean, independent of
    mem_batch chunking (including a non-divisible remainder). A sum of
    per-chunk means — the reference's accumulation, gem.py:233-256 —
    scales with the chunk count, overpowers the fixed v>=margin QP bound
    and collapses training (regression test for that bug)."""
    from clsurvey_tpu.data import parse as parse_ds
    from clsurvey_tpu.engine.train import make_context
    from clsurvey_tpu.methods.base import UpdateRule
    from clsurvey_tpu.methods.rehearsal import GEMRule
    from clsurvey_tpu.models.registry import (init_model_state,
                                              parse_model_name)

    seq = parse_ds("synthetic_2t_4c_32px")
    td = seq.get_task_dataset(1)
    spec = parse_model_name(str(fresh_config.models_root_path),
                            "tiny_CNN_cl_32_32", (32, 32))
    sd = init_model_state(spec, jax.random.PRNGKey(0), max_tasks=2,
                          classes_per_task=4)
    trainable = jax.tree_util.tree_map(jnp.asarray, {
        "params": sd["params"],
        "heads": {"kernel": sd["heads"]["kernel"],
                  "bias": sd["heads"]["bias"]}})

    grads = {}
    for mb in (48, 17, 20):  # 48 = single chunk; 17/20 chunk w/ remainder
        rule = GEMRule(48, mem_batch=mb)
        # augment OFF so chunking is the only difference
        ctx = make_context(spec, task=1, n_tasks=2, class_counts=[4, 4],
                           mean=seq.mean, std=seq.std, update_rule=rule,
                           augment=False, mesh=None)
        mem = fresh_task_memory(2, 48, (32, 32))
        mem = ring_buffer_update(mem, 0, jnp.asarray(td.train.images[:37]),
                                 jnp.asarray(td.train.labels[:37]))
        ms = rule.init_state(trainable, {"margin": 1.0}, ctx, memory=mem)
        G = rule._memory_grads_all(ctx, trainable, {}, ms,
                                   jax.random.PRNGKey(3))
        grads[mb] = np.asarray(G)
    np.testing.assert_allclose(grads[17], grads[48], rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(grads[20], grads[48], rtol=1e-4, atol=1e-7)
    assert np.abs(grads[48]).max() > 0  # non-trivial gradients


def test_partial_mem_remainder_covers_all_tasks():
    """When n_append < n past tasks, the remainder sampler must give every
    past task replay probability (the r1 static split starved the
    high-index tasks entirely), drawing rows from the right buffers."""
    from clsurvey_tpu.methods.rehearsal import (_exemplar_split,
                                                _sample_remainder_rows)

    assert _exemplar_split(2, 5) == (0, 2)
    assert _exemplar_split(7, 3) == (2, 1)

    t = 5
    mem = fresh_task_memory(n_tasks=t, n_memories=4, input_size=(2, 2))
    for tt in range(t):
        x = jnp.full((4, 2, 2, 3), tt, jnp.uint8)
        y = jnp.full((4,), tt * 10)
        mem = ring_buffer_update(mem, tt, x, y)
    seen = set()
    for s in range(64):
        x_u8, y, tt_dyn = _sample_remainder_rows(
            jax.random.PRNGKey(s), mem, t, 2, None)
        for row in range(2):
            task = int(tt_dyn[row])
            seen.add(task)
            # the row really comes from that task's buffer
            assert int(x_u8[row, 0, 0, 0]) == task
            assert int(y[row]) == task * 10
    assert seen == set(range(t))
