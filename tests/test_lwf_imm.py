"""LwF distillation + IMM merge tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clsurvey_tpu.methods.imm import merge_mean, merge_mode
from clsurvey_tpu.ops.distill import lwf_distill


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_lwf_distill_matches_reference_formula():
    """Check against a direct numpy transcription of the reference math
    (ref:src/methods/LwF/main_LWF.py:47-75)."""
    rng = np.random.default_rng(0)
    y = rng.normal(0, 3, (8, 5)).astype(np.float32)
    t = rng.normal(0, 3, (8, 5)).astype(np.float32)
    T = 2.0
    # reference: normalize by max, ysafe = y/T; p_t = softmax(t)^(1/T) renorm
    ny = y - y.max(1, keepdims=True)
    ysafe = ny / T
    nt = t - t.max(1, keepdims=True)
    p_t = _softmax(nt) ** (1 / T)
    p_t = p_t / p_t.sum(1, keepdims=True)
    expected = np.mean(
        np.log(np.exp(ysafe).sum(1)) - (p_t * ysafe).sum(1))
    got = float(lwf_distill(jnp.asarray(y), jnp.asarray(t), T))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_lwf_distill_zero_when_identical():
    """Distill loss is minimized (gradient ~ 0) when student == teacher."""
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.normal(0, 2, (4, 6)).astype(np.float32))
    g = jax.grad(lambda s: lwf_distill(s, t))(t)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-5)


def _fake_model(seed, val):
    rng = np.random.default_rng(seed)
    return {
        "params": {"w": np.full((3, 3), val, np.float32),
                   "b": rng.normal(0, 1, (3,)).astype(np.float32)},
        "batch_stats": {},
        "heads": {"kernel": rng.normal(0, 1, (2, 3, 4)).astype(np.float32),
                  "bias": np.zeros((2, 4), np.float32),
                  "class_counts": np.asarray([4, 4])},
        "meta": {},
    }


def test_merge_mean():
    m1, m2, m3 = _fake_model(1, 1.0), _fake_model(2, 2.0), _fake_model(3, 6.0)
    merged = merge_mean([m1, m2, m3])
    np.testing.assert_allclose(merged["params"]["w"], 3.0)
    # heads come from the last model, unmerged
    np.testing.assert_array_equal(merged["heads"]["kernel"],
                                  m3["heads"]["kernel"])
    expected_b = (m1["params"]["b"] + m2["params"]["b"]
                  + m3["params"]["b"]) / 3
    np.testing.assert_allclose(merged["params"]["b"], expected_b, rtol=1e-6)


def test_merge_mode_weights_by_precision():
    m1, m2 = _fake_model(1, 1.0), _fake_model(2, 5.0)
    p1 = {"w": np.full((3, 3), 3.0, np.float32),
          "b": np.ones((3,), np.float32)}
    p2 = {"w": np.full((3, 3), 1.0, np.float32),
          "b": np.ones((3,), np.float32)}
    merged = merge_mode([m1, m2], [p1, p2])
    # w: (3*1 + 1*5)/4 = 2.0
    np.testing.assert_allclose(merged["params"]["w"], 2.0, rtol=1e-6)


def test_imm_and_lwf_sequences(fresh_config):
    """mean_IMM (no_framework grid) and LWF (full framework) both run over
    the 2-task synthetic sequence after the SI base-model dump."""
    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main
    from clsurvey_tpu.utils import io, paths as paths_lib

    common_kwargs = dict(
        model_name="tiny_CNN_cl_32_32",
        ds_name="synthetic_2t_4c_32px",
        num_epochs=4, batch_size=32, lr_grid=(1e-2,),
        gridsearch_name="testgrid", max_attempts_per_task=2,
    )
    run_main(RunArgs(method_name="SI",
                     runmode="first_task_basemodel_dump", **common_kwargs))

    manager = run_main(RunArgs(method_name="mean_IMM", test=True,
                               **common_kwargs))
    out_dir = paths_lib.get_test_results_path(
        "synthetic_2t_4c_32px", "mean_IMM", "tiny_CNN_cl_32_32", "testgrid",
        manager.exp_name, create=False)
    assert os.path.isfile(os.path.join(
        out_dir, "test_method_performancesmean_IMM0.pth"))
    # merged model artifact exists next to the task-2 model
    merge_path = os.path.join(
        os.path.dirname(manager.previous_task_model_path),
        "best_model_mean_IMM_merge.pth.tar")
    assert io.exists(merge_path)

    manager = run_main(RunArgs(method_name="LWF", test=True,
                               # exercise the optional head-only warmup
                               # (ref:main_LWF.py:322-362)
                               static_hyperparams="2",
                               **common_kwargs))
    out_dir = paths_lib.get_test_results_path(
        "synthetic_2t_4c_32px", "LWF", "tiny_CNN_cl_32_32", "testgrid",
        manager.exp_name, create=False)
    from tests.helpers import load_seq_res

    seq = load_seq_res(out_dir, "LWF", 1)
    assert len(seq) == 2
    assert seq[1] > 50.0  # still performs after task 2


def test_mode_imm_sequence(fresh_config):
    """mode-IMM: per-task sampled-label Fisher precision matrices cached to
    disk, precision-weighted merge used at eval."""
    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main
    from clsurvey_tpu.utils import io, paths as paths_lib

    common_kwargs = dict(
        model_name="tiny_CNN_cl_32_32",
        ds_name="synthetic_2t_4c_32px",
        num_epochs=4, batch_size=32, lr_grid=(1e-2,),
        gridsearch_name="testgrid", max_attempts_per_task=2,
    )
    run_main(RunArgs(method_name="SI",
                     runmode="first_task_basemodel_dump", **common_kwargs))
    manager = run_main(RunArgs(method_name="mode_IMM", test=True,
                               **common_kwargs))
    import os

    task2_dir = os.path.dirname(manager.previous_task_model_path)
    # precision matrices cached next to each model (ref:merge.py:57-120)
    assert io.exists(os.path.join(task2_dir, "precision_mode_IMM.pth.tar"))
    assert io.exists(os.path.join(task2_dir,
                                  "best_model_mode_IMM_merge.pth.tar"))
    out_dir = paths_lib.get_test_results_path(
        "synthetic_2t_4c_32px", "mode_IMM", "tiny_CNN_cl_32_32",
        "testgrid", manager.exp_name, create=False)
    from tests.helpers import load_seq_res

    seq = load_seq_res(out_dir, "mode_IMM", 1)
    assert len(seq) == 2
    # merged model should still classify task 1 reasonably
    assert seq[0] > 40.0
