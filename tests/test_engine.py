"""Engine + models + data unit/integration tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clsurvey_tpu.data import parse as parse_ds
from clsurvey_tpu.engine.train import (
    Engine, TrainJob, TrainState, make_context, state_from_model,
    train_task, tree_zeros_like)
from clsurvey_tpu.methods.base import UpdateRule
from clsurvey_tpu.models import heads as heads_lib
from clsurvey_tpu.models.registry import (
    init_model_state, parse_model_name)


@pytest.fixture(scope="module")
def spec(tmp_path_factory):
    root = tmp_path_factory.mktemp("models")
    return parse_model_name(str(root), "tiny_CNN_cl_32_32", (32, 32))


def test_head_bank_masking():
    key = jax.random.PRNGKey(0)
    bank = heads_lib.init_head_bank(key, max_tasks=4, feat_dim=16,
                                    num_classes=5, class_counts=[5, 3, 5, 5])
    feats = jax.random.normal(key, (2, 16))
    logits = heads_lib.forward(bank, feats, 1)
    assert logits.shape == (2, 5)
    assert np.all(np.asarray(logits[:, 3:]) <= -1e9)  # masked slots
    all_logits = heads_lib.forward_all(bank, feats, 3)
    assert all_logits.shape == (2, 3, 5)
    np.testing.assert_allclose(np.asarray(all_logits[:, 1, :3]),
                               np.asarray(logits[:, :3]), rtol=1e-5)


def test_vgg_shapes(tmp_path):
    vgg = parse_model_name(str(tmp_path), "small_VGG9_cl_128_128", (32, 32))
    state = init_model_state(vgg, jax.random.PRNGKey(1), max_tasks=3,
                             classes_per_task=5)
    backbone = vgg.make_backbone()
    x = jnp.zeros((2, 32, 32, 3))
    feats = backbone.apply({"params": state["params"]}, x, train=False)
    assert feats.shape == (2, 128)


def test_param_report(spec):
    from clsurvey_tpu.models.registry import (
        count_parameters, print_module_composition)

    state = init_model_state(spec, jax.random.PRNGKey(1), max_tasks=2,
                             classes_per_task=4)
    report = print_module_composition(state)
    assert "TOTAL" in report
    assert count_parameters(state) > 0


def test_synthetic_dataset():
    seq = parse_ds("synthetic_3t_4c_32px")
    assert seq.task_count == 3
    td = seq.get_task_dataset(2)
    assert td.train.images.dtype == np.uint8
    assert td.train.images.shape[1:] == (32, 32, 3)
    assert td.num_classes == 4
    # deterministic
    td2 = parse_ds("synthetic_3t_4c_32px").get_task_dataset(2)
    np.testing.assert_array_equal(td.train.images, td2.train.images)


@pytest.mark.smoke
def test_train_task_learns(spec, tmp_path):
    """End-to-end slice: finetune on one synthetic task, acc should be high
    and artifacts written."""
    seq = parse_ds("synthetic_2t_4c_32px")
    td = seq.get_task_dataset(1)
    state_dict = init_model_state(spec, jax.random.PRNGKey(2), max_tasks=2,
                                  classes_per_task=4)
    ctx = make_context(spec, task=0, n_tasks=1, class_counts=[4, 4],
                       mean=seq.mean, std=seq.std, update_rule=UpdateRule())
    engine = Engine(ctx)
    rule = UpdateRule()
    trainable = {"params": state_dict["params"],
                 "heads": {"kernel": state_dict["heads"]["kernel"],
                           "bias": state_dict["heads"]["bias"]}}
    state = TrainState(trainable, {}, tree_zeros_like(trainable),
                       rule.init_state(trainable, {}, ctx))
    job = TrainJob(exp_dir=str(tmp_path / "exp"), num_epochs=12,
                   batch_size=32, lr=0.01)
    best_model, best_acc, _ = train_task(engine, job, state, td,
                                         log=lambda *a: None)
    assert best_acc > 0.8, best_acc
    assert (tmp_path / "exp" / "best_model.pth.tar").exists()
    # eval returns per-class counters summing to dataset size
    acc, pcc, pct = engine.evaluate(
        state_from_model(best_model, {}).trainable,
        best_model["batch_stats"],
        jnp.asarray(td.test.images), jnp.asarray(td.test.labels), 32)
    assert pct.sum() == td.test.size
    assert acc > 0.8


def test_resume_from_epoch_ckpt(spec, tmp_path):
    seq = parse_ds("synthetic_2t_4c_32px")
    td = seq.get_task_dataset(1)
    state_dict = init_model_state(spec, jax.random.PRNGKey(2), max_tasks=2,
                                  classes_per_task=4)
    ctx = make_context(spec, task=0, n_tasks=1, class_counts=[4, 4],
                       mean=seq.mean, std=seq.std, update_rule=UpdateRule())
    engine = Engine(ctx)
    rule = UpdateRule()
    def fresh_state():
        # copies: the engine donates state buffers into the epoch jit
        trainable = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True),
            {"params": state_dict["params"],
             "heads": {"kernel": state_dict["heads"]["kernel"],
                       "bias": state_dict["heads"]["bias"]}})
        return TrainState(trainable, {}, tree_zeros_like(trainable),
                          rule.init_state(trainable, {}, ctx))

    job = TrainJob(exp_dir=str(tmp_path / "exp"), num_epochs=3,
                   batch_size=32, lr=0.01, saving_freq=1)
    train_task(engine, job, fresh_state(), td, log=lambda *a: None)
    # resume with more epochs: must pick up from epoch 3
    logs = []
    job2 = TrainJob(exp_dir=str(tmp_path / "exp"), num_epochs=5,
                    batch_size=32, lr=0.01, saving_freq=1)
    train_task(engine, job2, fresh_state(), td, log=logs.append)
    assert any("resumed epoch 3" in str(line) for line in logs), logs


def test_all_vgg_variants_forward(tmp_path):
    """Every reference VGG family member builds and produces the right
    feature width (ref:src/models/VGGSlim.py:13-24 configs)."""
    for name, dim, px in (("base_VGG9_cl_512_512", 512, 64),
                          ("wide_VGG9_cl_512_512", 512, 64),
                          ("deep_VGG22_cl_512_512", 512, 64)):
        vgg = parse_model_name(str(tmp_path), name, (px, px))
        state = init_model_state(vgg, jax.random.PRNGKey(0), max_tasks=2,
                                 classes_per_task=5)
        feats = vgg.make_backbone().apply(
            {"params": state["params"]}, jnp.zeros((1, px, px, 3)),
            train=False)
        assert feats.shape == (1, dim), name


def test_tiny40_name_parsing():
    from clsurvey_tpu.data.tinyimagenet import TinyImagenetSequence

    seq = TinyImagenetSequence("tiny40", ds_root="/tmp/nonexistent")
    assert seq.task_count == 40
    assert seq.classes_per_task["1"] == 5
    seq2 = TinyImagenetSequence("tiny_hardeasy", ds_root="/tmp/nonexistent")
    assert seq2.task_count == 10
    assert seq2._root.endswith("tiny_10tasks_hardeasy")


def test_failed_run_persists_init_model(spec, tmp_path):
    """A run that never improves (here: a NaN-diverging lr) must still
    leave a finite best_model.pth.tar on disk — downstream tasks chain
    through that file, and the post-NaN state itself is poisoned
    (regression: EBLL task crash after a fully-NaN'd retained attempt)."""
    seq = parse_ds("synthetic_2t_4c_32px")
    td = seq.get_task_dataset(1)
    state_dict = init_model_state(spec, jax.random.PRNGKey(2), max_tasks=2,
                                  classes_per_task=4)
    ctx = make_context(spec, task=0, n_tasks=1, class_counts=[4, 4],
                       mean=seq.mean, std=seq.std, update_rule=UpdateRule())
    engine = Engine(ctx)
    rule = UpdateRule()
    trainable = {"params": state_dict["params"],
                 "heads": {"kernel": state_dict["heads"]["kernel"],
                           "bias": state_dict["heads"]["bias"]}}
    state = TrainState(trainable, {}, tree_zeros_like(trainable),
                       rule.init_state(trainable, {}, ctx))
    job = TrainJob(exp_dir=str(tmp_path / "failexp"), num_epochs=4,
                   batch_size=32, lr=1e6)  # guaranteed divergence
    best_model, best_acc, _ = train_task(engine, job, state, td,
                                         log=lambda *a: None)
    path = tmp_path / "failexp" / "best_model.pth.tar"
    assert path.exists()
    from clsurvey_tpu.utils import io as io_lib

    saved = io_lib.load(str(path))
    for leaf in jax.tree_util.tree_leaves(saved["params"]):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_finite_explosion_never_becomes_best(spec, tmp_path, monkeypatch):
    """An epoch that ends finite-but-exploded (the step BEFORE the NaN)
    must abort like NaN and never be recorded as best: its chance-level
    val accuracy beats the initial best_acc of 0.0, and persisting its
    1e11+-scale weights poisons the next task's Phase-1 from epoch 0
    (regression: SI lambda-decay retry cascade)."""
    seq = parse_ds("synthetic_2t_4c_32px")
    td = seq.get_task_dataset(1)
    state_dict = init_model_state(spec, jax.random.PRNGKey(3), max_tasks=2,
                                  classes_per_task=4)
    ctx = make_context(spec, task=0, n_tasks=1, class_counts=[4, 4],
                       mean=seq.mean, std=seq.std, update_rule=UpdateRule())
    engine = Engine(ctx)
    rule = UpdateRule()
    trainable = {"params": state_dict["params"],
                 "heads": {"kernel": state_dict["heads"]["kernel"],
                           "bias": state_dict["heads"]["bias"]}}
    state = TrainState(trainable, {}, tree_zeros_like(trainable),
                       rule.init_state(trainable, {}, ctx))

    monkeypatch.setattr(
        engine, "train_epoch",
        lambda st, *a, **k: (st, {"loss": 5e17, "acc": 0.25}))
    monkeypatch.setattr(
        engine, "evaluate", lambda *a, **k: (0.25, None, None))

    job = TrainJob(exp_dir=str(tmp_path / "explodeexp"), num_epochs=4,
                   batch_size=32, lr=1e-2)
    best_model, best_acc, _ = train_task(engine, job, state, td,
                                         log=lambda *a: None)
    assert best_acc == 0.0
    # the persisted model is the task-start snapshot, not the exploded one
    assert best_model["meta"].get("failed_attempt")
    for leaf in jax.tree_util.tree_leaves(best_model["params"]):
        assert np.abs(np.asarray(leaf)).max() < 1e3


def test_frozen_backbone_does_not_decay(spec):
    """freeze_backbone with weight_decay > 0: backbone params must stay
    bit-identical (the reference's freeze_mode optimizes only the
    classifier, ref:src/methods/Finetune/main_SGD.py:69-72 — weight decay
    must not leak into frozen weights through momentum)."""
    state_dict = init_model_state(spec, jax.random.PRNGKey(0), max_tasks=2,
                                  classes_per_task=4)
    ctx = make_context(
        spec, task=0, n_tasks=2, class_counts=[4, 4],
        mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25),
        update_rule=UpdateRule(), augment=False, freeze_backbone=True,
        weight_decay=1e-2)
    engine = Engine(ctx)
    rule = UpdateRule()
    trainable = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True),
        {"params": state_dict["params"],
         "heads": {"kernel": state_dict["heads"]["kernel"],
                   "bias": state_dict["heads"]["bias"]}})
    before = jax.tree_util.tree_map(np.asarray, trainable["params"])
    head_before = np.array(trainable["heads"]["kernel"], copy=True)
    state = TrainState(trainable, {}, tree_zeros_like(trainable),
                       rule.init_state(trainable, {}, ctx))
    rng = np.random.default_rng(0)
    n = 32
    images = jnp.asarray(rng.integers(0, 255, (n, 32, 32, 3),
                                      dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 4, (n,), dtype=np.int32))
    key = jax.random.PRNGKey(1)
    state, _ = engine.train_epoch(state, images, labels,
                                  jax.random.permutation(key, n), key,
                                  1e-2, 16)
    after = jax.tree_util.tree_map(np.asarray, state.trainable["params"])
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(before),
            jax.tree_util.tree_leaves_with_path(after)):
        np.testing.assert_array_equal(a, b, err_msg=str(pa))
    # the head DID train
    assert not np.array_equal(
        head_before, np.asarray(state.trainable["heads"]["kernel"]))
