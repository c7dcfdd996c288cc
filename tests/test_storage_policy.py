"""LR-grid StoragePolicy semantics (ref:src/framework/lr_grid_train.py:
162-176) and the save-mode selection: 'all' for Phase-1-only methods
(ref:src/framework/main.py:166), save_models_FT_heuristic -> 'all'
(ref:src/framework/framework_train.py:229-235), and the documented
only_keep_best default deviation for framework methods
(docs/DEVIATIONS.md "Phase-1 storage policy")."""

import os

import pytest

from clsurvey_tpu.framework.common import RunArgs
from clsurvey_tpu.framework.main import main as run_main
from clsurvey_tpu.utils import io
from clsurvey_tpu.utils.paths import LR_GRID_DIRNAME, TASK_TRAINING_DIRNAME


def _args(**kw):
    base = dict(
        model_name="tiny_CNN_cl_32_32",
        ds_name="synthetic_2t_4c_32px",
        method_name="finetuning",
        num_epochs=4,
        batch_size=32,
        lr_grid=(1e-2, 1e-3),
        finetune_iterations=1,
        gridsearch_name="storagegrid",
        max_task_count=1,
    )
    base.update(kw)
    return RunArgs(**base)


def _lr_dirs(manager, task=1):
    grid = os.path.join(manager.task_dir(task, create=False),
                        LR_GRID_DIRNAME)
    return sorted(d for d in os.listdir(grid) if d.startswith("lr="))


def test_phase1_only_method_keeps_all(fresh_config):
    # finetuning runs the Phase-1-only branch, which pins 'all'
    # (ref:src/framework/main.py:166) — its grid models ARE its task
    # models, so every candidate survives and TASK_TRAINING symlinks to
    # the winner.
    manager = run_main(_args())
    kept = _lr_dirs(manager)
    assert len(kept) == 2
    tt = os.path.join(manager.task_dir(1, create=False),
                      TASK_TRAINING_DIRNAME)
    assert os.path.islink(tt)
    assert os.path.basename(os.path.realpath(tt)) in kept
    assert io.exists(manager.previous_task_model_path)


def _run_si(policy=None, **kw):
    common = dict(method_name="SI", max_task_count=2,
                  max_attempts_per_task=2)
    if policy is not None:
        common["grid_storage_policy"] = policy
    run_main(_args(method_name="SI",
                   runmode="first_task_basemodel_dump"))
    return run_main(_args(**common, **kw))


def test_framework_method_only_keep_best(fresh_config):
    manager = _run_si()  # repo default (documented deviation)
    assert len(_lr_dirs(manager, task=2)) == 1


def test_framework_method_keep_none(fresh_config):
    # the reference's hardcoded framework-method mode
    # (ref:src/framework/framework_train.py:235): no grid dir survives;
    # the converged model lives in a real TASK_TRAINING directory.
    manager = _run_si(policy="keep_none")
    assert _lr_dirs(manager, task=2) == []
    tt = os.path.join(manager.task_dir(2, create=False),
                      TASK_TRAINING_DIRNAME)
    assert os.path.isdir(tt) and not os.path.islink(tt)
    assert io.exists(manager.previous_task_model_path)


def test_ft_heuristic_overrides_policy(fresh_config):
    manager = _run_si(policy="keep_none", save_models_FT_heuristic=True)
    assert len(_lr_dirs(manager, task=2)) == 2  # forced 'all'


def test_invalid_policy_rejected():
    from clsurvey_tpu.framework.lr_grid import StoragePolicy

    with pytest.raises(ValueError):
        StoragePolicy("keep_some")
