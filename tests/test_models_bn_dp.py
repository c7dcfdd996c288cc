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


def _dp_meshes():
    return (("dp8", mesh_lib.make_mesh(jax.devices())),
            ("dp1", mesh_lib.make_mesh(jax.devices()[:1])))


def test_gem_dp_matches_single_device(tmp_path):
    """GEM's vmapped memory-gradient sweep + QP projection must give the
    same metrics on an 8-device data mesh as on one device (the psum of
    memory grads over ICI is the point of the layer, SURVEY §2.7)."""
    from clsurvey_tpu.methods.rehearsal import (
        GEMRule, fresh_task_memory, fill_buffer_from_data)

    spec = parse_model_name(str(tmp_path), "tiny_CNN_cl_32_32", (32, 32))
    seq = parse_ds("synthetic_2t_4c_32px")
    td1 = seq.get_task_dataset(1)
    td2 = seq.get_task_dataset(2)
    sd = init_model_state(spec, jax.random.PRNGKey(2), max_tasks=2,
                          classes_per_task=4)
    mem = fresh_task_memory(2, 16, (32, 32))
    mem = fill_buffer_from_data(mem, 0, np.asarray(td1.train.images),
                                np.asarray(td1.train.labels), seed=3)
    images = jnp.asarray(td2.train.images)
    labels = jnp.asarray(td2.train.labels)
    perm = jax.random.permutation(jax.random.PRNGKey(0), images.shape[0])
    results = {}
    for name, mesh in _dp_meshes():
        rule = GEMRule(n_memories=16, mem_batch=16)
        ctx = make_context(spec, task=1, n_tasks=2, class_counts=[4, 4],
                           mean=seq.mean, std=seq.std, update_rule=rule,
                           mesh=mesh)
        engine = Engine(ctx)
        tr = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True),
            {"params": sd["params"],
             "heads": {"kernel": sd["heads"]["kernel"],
                       "bias": sd["heads"]["bias"]}})
        # the engine donates state buffers — copy the shared memory pytree
        mstate = rule.init_state(tr, {"margin": 0.5}, ctx,
                                 memory=jax.tree_util.tree_map(
                                     lambda x: jnp.array(x, copy=True), mem))
        state = TrainState(tr, {}, tree_zeros_like(tr), mstate)
        if mesh.devices.size > 1:
            state = jax.device_put(state, mesh_lib.replicated(mesh))
        for e in range(2):
            key = jax.random.fold_in(jax.random.PRNGKey(1), e)
            state, m = engine.train_epoch(state, images, labels, perm,
                                          key, 0.01, 32)
        results[name] = (float(m["loss"]), float(m["acc"]),
                         float(m["projected"]))
    assert results["dp8"] == pytest.approx(results["dp1"], rel=2e-2,
                                           abs=1e-3), results


def test_ewc_fisher_dp_matches_single_device(tmp_path):
    """The Fisher scan under an 8-device mesh context equals the 1-device
    result (importance tensors are Ω accumulations psum'd over ICI)."""
    from clsurvey_tpu.ops import importance as imp_lib

    spec = parse_model_name(str(tmp_path), "tiny_CNN_cl_32_32", (32, 32))
    seq = parse_ds("synthetic_2t_4c_32px")
    td = seq.get_task_dataset(1)
    sd = init_model_state(spec, jax.random.PRNGKey(2), max_tasks=2,
                          classes_per_task=4)
    params = jax.tree_util.tree_map(jnp.asarray, sd["params"])
    bank = {"kernel": jnp.asarray(sd["heads"]["kernel"]),
            "bias": jnp.asarray(sd["heads"]["bias"]),
            "class_counts": np.asarray([4, 4])}
    images = jnp.asarray(td.train.images[:64])
    labels = jnp.asarray(td.train.labels[:64])
    omegas = {}
    for name, mesh in _dp_meshes():
        ctx = make_context(spec, task=0, n_tasks=1, class_counts=[4, 4],
                           mean=seq.mean, std=seq.std,
                           update_rule=UpdateRule(), mesh=mesh)
        omegas[name] = imp_lib.ewc_fisher(ctx, params, {}, bank, 0,
                                          images, labels, batch_size=16)
    for a, b in zip(jax.tree_util.tree_leaves(omegas["dp8"]),
                    jax.tree_util.tree_leaves(omegas["dp1"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_bn_epoch_dp_matches_single_device(tmp_path):
    """BN batch_stats under sharded batches: dp8 vs dp1 metric parity
    (GSPMD must reduce the batch moments over the data axis)."""
    spec = parse_model_name(str(tmp_path), "tiny_CNN_cl_32_32_BN", (32, 32))
    seq = parse_ds("synthetic_2t_4c_32px")
    td = seq.get_task_dataset(1)
    sd = init_model_state(spec, jax.random.PRNGKey(2), max_tasks=2,
                          classes_per_task=4)
    images = jnp.asarray(td.train.images)
    labels = jnp.asarray(td.train.labels)
    perm = jax.random.permutation(jax.random.PRNGKey(0), images.shape[0])
    results = {}
    stats = {}
    for name, mesh in _dp_meshes():
        ctx = make_context(spec, task=0, n_tasks=1, class_counts=[4, 4],
                           mean=seq.mean, std=seq.std,
                           update_rule=UpdateRule(), mesh=mesh)
        engine = Engine(ctx)
        state = _fresh_state(sd, UpdateRule(), ctx)
        if mesh.devices.size > 1:
            state = jax.device_put(state, mesh_lib.replicated(mesh))
        for e in range(2):
            key = jax.random.fold_in(jax.random.PRNGKey(1), e)
            state, m = engine.train_epoch(state, images, labels, perm,
                                          key, 0.01, 32)
        results[name] = (float(m["loss"]), float(m["acc"]))
        stats[name] = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    assert results["dp8"] == pytest.approx(results["dp1"], rel=2e-2), results
    for a, b in zip(jax.tree_util.tree_leaves(stats["dp8"]),
                    jax.tree_util.tree_leaves(stats["dp1"])):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_hat_dp_matches_single_device(tmp_path):
    """HAT's gated epoch (in-scan s-annealing, sparsity reg, cosh-
    compensated embedding grads) must give the same metrics on an
    8-device data mesh as on one device — the mask method's own engine
    rides the same GSPMD layer as the shared engine (SURVEY §2.7)."""
    from clsurvey_tpu.methods.hat import (
        HATEngine, compute_mask_pre, make_hat_model)
    from clsurvey_tpu.models import heads as heads_lib

    spec = parse_model_name(str(tmp_path), "tiny_CNN_cl_32_32", (32, 32))
    seq = parse_ds("synthetic_2t_4c_32px")
    td = seq.get_task_dataset(1)
    model = make_hat_model(spec, n_tasks=2)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros((2, 32, 32, 3)), 0, jnp.float32(1.0))
    counts = np.asarray([4, 4], np.int32)
    bank = heads_lib.init_head_bank(jax.random.fold_in(key, 5), 2,
                                    spec.feature_dim, 4, counts)
    images = jnp.asarray(td.train.images)
    labels = jnp.asarray(td.train.labels)
    perm = jax.random.permutation(jax.random.PRNGKey(0), images.shape[0])
    results = {}
    for name, mesh in _dp_meshes():
        params = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), variables["params"])
        engine = HATEngine(
            model, spec, 0, counts, seq.mean, seq.std, 400.0, None,
            compute_mask_pre(model, params, 0, 400.0), None, mesh=mesh)
        trainable = {
            "params": params,
            "heads": {"kernel": jnp.array(bank["kernel"], copy=True),
                      "bias": jnp.array(bank["bias"], copy=True)}}
        state = (trainable,
                 jax.tree_util.tree_map(jnp.zeros_like, trainable))
        if mesh.devices.size > 1:
            state = jax.device_put(state, mesh_lib.replicated(mesh))
        for e in range(2):
            k = jax.random.fold_in(jax.random.PRNGKey(1), e)
            state, m = engine._train_epoch(
                state, images, labels, perm, k, jnp.float32(0.01),
                jnp.float32(0.5), 32)
        # non-divisible eval batch exercises _round_batch + padding
        val_acc = engine.evaluate(state[0], jnp.asarray(td.val.images),
                                  jnp.asarray(td.val.labels), 30)
        results[name] = (float(m["loss"]), float(m["acc"]), val_acc)
    assert results["dp8"] == pytest.approx(results["dp1"], rel=2e-2,
                                           abs=1e-3), results


def test_pathnet_dp_matches_single_device(tmp_path):
    """A PathNet candidate-path epoch + padded eval under dp8 matches dp1
    (module weights/paths/gates replicated, batch sharded)."""
    from clsurvey_tpu.methods.pathnet import PathNet, module_train_mask
    from clsurvey_tpu.models import heads as heads_lib

    spec = parse_model_name(str(tmp_path), "tiny_CNN_cl_32_32", (32, 32))
    seq = parse_ds("synthetic_2t_4c_32px")
    td = seq.get_task_dataset(1)
    pn = PathNet()
    pn.static_hyperparams["M"] = 4

    class _Mgr:
        model_spec = spec

    model = pn._module(_Mgr(), N=2)
    L = model.n_layers
    n_convs = len(model.layer_sizes()[0])
    path = np.tile(np.asarray([0, 1], np.int32), (L, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((2, 32, 32, 3)), jnp.asarray(path))
    counts = np.asarray([4, 4], np.int32)
    bank = heads_lib.init_head_bank(jax.random.PRNGKey(5), 2,
                                    model.feature_dim, 4, counts)
    images = jnp.asarray(td.train.images)
    labels = jnp.asarray(td.train.labels)
    n = int(images.shape[0])
    results = {}
    for name, mesh in _dp_meshes():
        with mesh_lib.use_mesh(mesh):
            train_epoch, eval_acc = pn._make_fns(
                model, seq.mean, seq.std, counts, 0)
            trainable = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True),
                {"params": variables["params"],
                 "heads": {"kernel": bank["kernel"],
                           "bias": bank["bias"]}})
            momentum = jax.tree_util.tree_map(jnp.zeros_like, trainable)
            if mesh.devices.size > 1:
                trainable, momentum = jax.device_put(
                    (trainable, momentum), mesh_lib.replicated(mesh))
            gates = module_train_mask(trainable["params"], path,
                                      np.zeros((L, 4), np.float32),
                                      n_convs)
            bsz = min(64, n)
            nd = mesh.devices.size
            if nd > 1 and bsz % nd:
                bsz = max((bsz // nd) * nd, nd)
            for e in range(2):
                k = jax.random.fold_in(jax.random.PRNGKey(1), e)
                perm = jax.random.permutation(k, n)[: (n // bsz) * bsz]
                trainable, momentum = train_epoch(
                    trainable, momentum, images, labels, perm,
                    jnp.asarray(path), gates, jax.random.fold_in(k, 1),
                    jnp.float32(0.01))
            acc = float(eval_acc(trainable, jnp.asarray(td.val.images),
                                 jnp.asarray(td.val.labels),
                                 jnp.asarray(path), batch_size=30))
            # L2-norm probe (a plain sum of the near-zero-mean kernel
            # catastrophically cancels — reduction-order noise dominates)
            weight_probe = float(jnp.linalg.norm(
                trainable["heads"]["kernel"]))
            results[name] = (acc, weight_probe)
    assert results["dp8"][0] == pytest.approx(results["dp1"][0], abs=2e-2), \
        results
    assert results["dp8"][1] == pytest.approx(results["dp1"][1], rel=1e-3), \
        results


def test_batch_size_rounded_to_mesh_multiple(tmp_path):
    """bs=30 on an 8-device mesh must not crash constrain_batch: the
    engine rounds train batches down (30→24) and eval batches up (30→32,
    absorbed by the padded-batch weights)."""
    spec = parse_model_name(str(tmp_path), "tiny_CNN_cl_32_32", (32, 32))
    seq = parse_ds("synthetic_2t_4c_32px")
    td = seq.get_task_dataset(1)
    sd = init_model_state(spec, jax.random.PRNGKey(2), max_tasks=2,
                          classes_per_task=4)
    mesh = mesh_lib.make_mesh(jax.devices())
    assert mesh.devices.size == 8
    ctx = make_context(spec, task=0, n_tasks=1, class_counts=[4, 4],
                       mean=seq.mean, std=seq.std,
                       update_rule=UpdateRule(), mesh=mesh)
    engine = Engine(ctx)
    assert engine._round_batch(30, 1000) == 24
    assert engine._round_batch(5, 1000) == 8
    state = _fresh_state(sd, UpdateRule(), ctx)
    state = jax.device_put(state, mesh_lib.replicated(mesh))
    images = jnp.asarray(td.train.images)
    labels = jnp.asarray(td.train.labels)
    perm = jax.random.permutation(jax.random.PRNGKey(0), images.shape[0])
    state, m = engine.train_epoch(state, images, labels, perm,
                                  jax.random.PRNGKey(1), 0.01, 30)
    assert np.isfinite(float(m["loss"]))
    # eval with a non-divisible batch on the full (non-divisible) val set
    acc, pcc, pct = engine.evaluate(state.trainable, state.batch_stats,
                                    jnp.asarray(td.val.images),
                                    jnp.asarray(td.val.labels), 30)
    assert 0.0 <= acc <= 1.0
    assert float(pct.sum()) == td.val.images.shape[0]
