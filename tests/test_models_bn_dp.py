"""BN/dropout model variants + data-parallel consistency tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clsurvey_tpu.data import parse as parse_ds
from clsurvey_tpu.engine.train import (
    Engine, TrainJob, TrainState, make_context, train_task,
    tree_zeros_like)
from clsurvey_tpu.methods.base import UpdateRule
from clsurvey_tpu.models.registry import init_model_state, parse_model_name
from clsurvey_tpu.parallel import mesh as mesh_lib


def _fresh_state(sd, rule, ctx):
    tr = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True),
        {"params": sd["params"],
         "heads": {"kernel": sd["heads"]["kernel"],
                   "bias": sd["heads"]["bias"]}})
    bs = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), sd.get("batch_stats", {}))
    return TrainState(tr, bs, tree_zeros_like(tr),
                      rule.init_state(tr, {}, ctx))


def test_bn_drop_model_trains(tmp_path):
    """BN (mutable batch_stats) + dropout (rng) paths through the engine
    (reference model names with _BN_DROP segments,
    ref:src/models/net.py:150-156)."""
    spec = parse_model_name(str(tmp_path), "tiny_CNN_cl_32_32_BN_DROP",
                            (32, 32))
    assert spec.batch_norm and spec.dropout
    seq = parse_ds("synthetic_2t_4c_32px")
    td = seq.get_task_dataset(1)
    sd = init_model_state(spec, jax.random.PRNGKey(2), max_tasks=2,
                          classes_per_task=4)
    assert sd["batch_stats"], "BN model must carry batch_stats"
    ctx = make_context(spec, task=0, n_tasks=1, class_counts=[4, 4],
                       mean=seq.mean, std=seq.std,
                       update_rule=UpdateRule())
    engine = Engine(ctx)
    state = _fresh_state(sd, UpdateRule(), ctx)
    job = TrainJob(exp_dir=str(tmp_path / "exp"), num_epochs=10,
                   batch_size=32, lr=0.01, save_models_mode=False)
    best_model, best_acc, final = train_task(engine, job, state, td,
                                             log=lambda *a: None)
    assert best_acc > 0.7, best_acc
    # batch_stats were updated during training
    init_leaves = jax.tree_util.tree_leaves(sd["batch_stats"])
    new_leaves = jax.tree_util.tree_leaves(best_model["batch_stats"])
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(init_leaves, new_leaves))
    assert changed


def test_dp_matches_single_device(tmp_path):
    """The same epoch on an 8-device data mesh and on a single device must
    produce (near-)identical metrics — GSPMD only changes the layout."""
    spec = parse_model_name(str(tmp_path), "tiny_CNN_cl_32_32", (32, 32))
    seq = parse_ds("synthetic_2t_4c_32px")
    td = seq.get_task_dataset(1)
    sd = init_model_state(spec, jax.random.PRNGKey(2), max_tasks=2,
                          classes_per_task=4)
    images = jnp.asarray(td.train.images)
    labels = jnp.asarray(td.train.labels)
    perm = jax.random.permutation(jax.random.PRNGKey(0),
                                  images.shape[0])
    results = {}
    for name, mesh in (("dp8", mesh_lib.make_mesh(jax.devices())),
                       ("dp1", mesh_lib.make_mesh(jax.devices()[:1]))):
        ctx = make_context(spec, task=0, n_tasks=1, class_counts=[4, 4],
                           mean=seq.mean, std=seq.std,
                           update_rule=UpdateRule(), mesh=mesh)
        engine = Engine(ctx)
        state = _fresh_state(sd, UpdateRule(), ctx)
        if mesh.devices.size > 1:
            state = jax.device_put(state, mesh_lib.replicated(mesh))
        for e in range(3):
            key = jax.random.fold_in(jax.random.PRNGKey(1), e)
            state, m = engine.train_epoch(state, images, labels, perm,
                                          key, 0.01, 32)
        results[name] = (float(m["loss"]), float(m["acc"]))
    assert results["dp8"] == pytest.approx(results["dp1"], rel=2e-2), \
        results
