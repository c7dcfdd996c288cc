"""Chunked/streaming data path for splits over the HBM budget
(VERDICT r1 #3; replaces the reference's disk-streaming DataLoaders,
ref:src/methods/rehearsal/main_rehearsal.py:181-184)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clsurvey_tpu.data import registry as data_lib
from clsurvey_tpu.engine.train import (
    Engine, TrainJob, TrainState, data_budget_bytes, make_context,
    train_task, tree_zeros_like)
from clsurvey_tpu.methods.base import UpdateRule
from clsurvey_tpu.models import heads as heads_lib, registry as models_lib


def _make_state(spec, key, counts):
    model = models_lib.init_model_state(spec, key, max_tasks=2,
                                        classes_per_task=int(max(counts)),
                                        class_counts=counts)
    trainable = {
        "params": jax.tree_util.tree_map(jnp.asarray, model["params"]),
        "heads": {"kernel": jnp.asarray(model["heads"]["kernel"]),
                  "bias": jnp.asarray(model["heads"]["bias"])},
    }
    bs = jax.tree_util.tree_map(jnp.asarray, model.get("batch_stats", {}))
    return TrainState(trainable, bs, tree_zeros_like(trainable),
                      UpdateRule().init_state(trainable, {}, None))


def _train(tmp_path, budget_mb, tag, monkeypatch):
    monkeypatch.setenv("CLSURVEY_DATA_BUDGET_MB", str(budget_mb))
    seq = data_lib.parse("synthetic_2t_4c_32px_200n")
    td = seq.get_task_dataset(1)
    spec = models_lib.parse_model_name(str(tmp_path), "tiny_CNN_cl_32_32",
                                       seq.input_size)
    counts = np.array([4, 4], np.int32)
    ctx = make_context(spec=spec, task=0, n_tasks=1, class_counts=counts,
                       mean=seq.mean, std=seq.std,
                       update_rule=UpdateRule())
    engine = Engine(ctx)
    state = _make_state(spec, jax.random.PRNGKey(0), counts)
    job = TrainJob(exp_dir=str(tmp_path / tag), num_epochs=4,
                   batch_size=32, lr=1e-2, save_models_mode=False)
    return train_task(engine, job, state, td, log=lambda *a: None)


def test_budget_env_override(monkeypatch):
    monkeypatch.setenv("CLSURVEY_DATA_BUDGET_MB", "3")
    assert data_budget_bytes() == 3 * 2 ** 20


def test_streaming_matches_resident_learning(tmp_path, monkeypatch):
    """A split forced over a tiny budget must train to the same quality
    as the resident fast path (same compiled step, chunked feeding)."""
    # 800 imgs x 32x32x3 = 2.4 MiB: resident under the default budget
    _, res_acc, _ = _train(tmp_path, 2048, "resident", monkeypatch)
    # 1 MiB budget forces ~160-row chunks
    _, stream_acc, _ = _train(tmp_path, 1, "stream", monkeypatch)
    assert res_acc > 0.9
    assert stream_acc > 0.9
    assert abs(res_acc - stream_acc) < 0.05


def test_chunk_rows_bounded_by_budget():
    """By construction a chunk transfer never exceeds half the budget, so
    an iNaturalist-scale task (10^5 imgs @ 224px = ~15 GiB) cannot OOM."""
    budget = 2048 * 2 ** 20
    row_bytes = 224 * 224 * 3           # one 224px uint8 image
    n = 100_000
    chunk_rows = max(budget // 2 // row_bytes, 1)
    chunk_rows = max((chunk_rows // 200) * 200, 200)
    assert chunk_rows * row_bytes <= budget // 2
    assert chunk_rows < n               # actually streams


def test_chunked_epoch_equals_resident_epoch():
    """Host gather of perm + contiguous slices consumes exactly the same
    batches as the device gather by perm: with augmentation and dropout
    off (RNG inert), one epoch of each path must land on the same
    weights and metrics."""
    import flax.linen as nn

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (96, 8, 8, 3), np.uint8)
    labels = rng.integers(0, 4, (96,), np.int32).astype(np.int32)

    class TinySpec:
        arch = "dense_probe"
        uses_dropout = False
        has_batch_stats = False
        compute_dtype = jnp.float32

        def make_backbone(self):
            class M(nn.Module):
                @nn.compact
                def __call__(self, x, train=False, **kw):
                    return nn.Dense(8)(x.reshape((x.shape[0], -1)))
            return M()

    counts = np.array([4], np.int32)
    key = jax.random.PRNGKey(1)
    bank = heads_lib.init_head_bank(key, 1, 8, 4, counts)
    spec = TinySpec()
    params0 = spec.make_backbone().init(key, jnp.zeros((1, 8, 8, 3)))[
        "params"]

    def fresh_state():
        tr = {"params": jax.tree_util.tree_map(jnp.array, params0),
              "heads": {"kernel": jnp.array(bank["kernel"]),
                        "bias": jnp.array(bank["bias"])}}
        return TrainState(tr, {}, tree_zeros_like(tr),
                          UpdateRule().init_state(tr, {}, None))

    ctx = make_context(spec=spec, task=0, n_tasks=1,
                       class_counts=counts, mean=(0.0, 0.0, 0.0),
                       std=(1.0, 1.0, 1.0),
                       update_rule=UpdateRule(), augment=False)
    engine = Engine(ctx)
    perm = np.asarray(jax.random.permutation(jax.random.PRNGKey(2), 96))

    res_state, res_metrics = engine.train_epoch(
        fresh_state(), jnp.asarray(images), jnp.asarray(labels),
        jnp.asarray(perm), jax.random.PRNGKey(3), 1e-2, 32)
    chunk_state, chunk_metrics = engine.train_epoch_chunked(
        fresh_state(), images, labels, perm, jax.random.PRNGKey(3),
        1e-2, 32, chunk_rows=48)  # 2 chunks of 48 rows

    for a, b in zip(jax.tree_util.tree_leaves(res_state.trainable),
                    jax.tree_util.tree_leaves(chunk_state.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(res_metrics["loss"]),
                               float(chunk_metrics["loss"]), rtol=1e-5)


def test_chunked_eval_equals_resident_eval():
    """evaluate_chunked must reproduce resident evaluate exactly: same
    accuracy and identical per-class counters (summed across chunks,
    incl. a ragged final chunk)."""
    import flax.linen as nn

    rng = np.random.default_rng(5)
    images = rng.integers(0, 255, (90, 8, 8, 3), np.uint8)
    labels = rng.integers(0, 4, (90,), np.int32).astype(np.int32)

    class TinySpec:
        arch = "dense_probe"
        uses_dropout = False
        has_batch_stats = False
        compute_dtype = jnp.float32

        def make_backbone(self):
            class M(nn.Module):
                @nn.compact
                def __call__(self, x, train=False, **kw):
                    return nn.Dense(8)(x.reshape((x.shape[0], -1)))
            return M()

    counts = np.array([4], np.int32)
    key = jax.random.PRNGKey(1)
    bank = heads_lib.init_head_bank(key, 1, 8, 4, counts)
    spec = TinySpec()
    params0 = spec.make_backbone().init(key, jnp.zeros((1, 8, 8, 3)))[
        "params"]
    tr = {"params": params0,
          "heads": {"kernel": jnp.array(bank["kernel"]),
                    "bias": jnp.array(bank["bias"])}}
    ctx = make_context(spec=spec, task=0, n_tasks=1,
                       class_counts=counts, mean=(0.0, 0.0, 0.0),
                       std=(1.0, 1.0, 1.0),
                       update_rule=UpdateRule(), augment=False)
    engine = Engine(ctx)

    acc_r, pcc_r, pct_r = engine.evaluate(
        tr, {}, jnp.asarray(images), jnp.asarray(labels), 32)
    acc_c, pcc_c, pct_c = engine.evaluate_chunked(
        tr, {}, images, labels, 32, chunk_rows=40)  # ragged last chunk
    assert acc_c == pytest.approx(acc_r)
    np.testing.assert_array_equal(np.asarray(pcc_r), pcc_c)
    np.testing.assert_array_equal(np.asarray(pct_r), pct_c)
