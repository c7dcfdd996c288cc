"""Mid-sequence restart via --starting_task_count > 1
(ref:src/framework/main.py:234-241): the restarted run must resume from
task N-1's best model — postprocessed name included — and reproduce the
uninterrupted run's eval matrix."""

import os

import numpy as np
import pytest

from clsurvey_tpu.framework.common import Manager, RunArgs
from clsurvey_tpu.framework.main import get_init_model_path, main as run_main
from clsurvey_tpu.utils import io, paths as paths_lib

COMMON = dict(
    model_name="tiny_CNN_cl_32_32",
    ds_name="synthetic_3t_4c_32px",
    num_epochs=4, batch_size=32, lr_grid=(1e-2,),
    gridsearch_name="testgrid",
    max_attempts_per_task=2,
)


def _eval_matrix(manager, method_name):
    out_dir = paths_lib.get_test_results_path(
        COMMON["ds_name"], method_name, COMMON["model_name"],
        COMMON["gridsearch_name"], manager.exp_name, create=False)
    mats = {}
    for i in range(3):
        path = os.path.join(
            out_dir, f"test_method_performances{method_name}{i}.pth")
        mats[i] = io.load(path)[method_name]["seq_res"]
    return mats


def test_ewc_interrupt_resume_matches_uninterrupted(fresh_config):
    """Train EWC tasks 1-2, stop, restart with starting_task_count=3; the
    eval matrix must match the uninterrupted 3-task run (VERDICT r1 #2)."""
    run_main(RunArgs(method_name="SI",
                     runmode="first_task_basemodel_dump", **COMMON))

    # uninterrupted reference run
    m_full = run_main(RunArgs(method_name="EWC", test=True, **COMMON))
    full = _eval_matrix(m_full, "EWC")

    # interrupted run in a separate experiment tree (same hyperparams ->
    # same exp_name, so isolate via gridsearch_name)
    kwargs = dict(COMMON, gridsearch_name="testgrid_resume")
    run_main(RunArgs(method_name="EWC", max_task_count=2, **kwargs))
    m_res = run_main(RunArgs(method_name="EWC", starting_task_count=3,
                             test=True, **kwargs))

    out_dir = paths_lib.get_test_results_path(
        COMMON["ds_name"], "EWC", COMMON["model_name"],
        "testgrid_resume", m_res.exp_name, create=False)
    resumed = {
        i: io.load(os.path.join(
            out_dir, f"test_method_performancesEWC{i}.pth"))["EWC"][
                "seq_res"]
        for i in range(3)}

    for i in range(3):
        for k in full[i]:
            np.testing.assert_allclose(
                resumed[i][k], full[i][k], atol=1e-4,
                err_msg=f"ref task {i} diverged after mid-sequence resume")
    # carried omega must ride along (task 3 saw tasks 1+2's Fisher)
    best = io.load(m_res.previous_task_model_path)
    assert "method_aux" in best and "omega" in best["method_aux"]


def test_resume_missing_model_fails_loudly(fresh_config):
    from clsurvey_tpu import methods as methods_lib
    from clsurvey_tpu.data import registry as data_lib
    from clsurvey_tpu.models import registry as models_lib
    from clsurvey_tpu.utils.config import load_config

    args = RunArgs(method_name="EWC", starting_task_count=3, **COMMON)
    cfg = load_config()
    manager = Manager(
        args=args, dataset=data_lib.parse(COMMON["ds_name"]),
        method=methods_lib.parse("EWC"),
        model_spec=models_lib.parse_model_name(
            cfg.models_root_path, COMMON["model_name"], (32, 32)),
        gridsearch_name="testgrid", exp_name="exp")
    with pytest.raises(FileNotFoundError, match="NOT EXISTING"):
        get_init_model_path(args, manager)


def test_resume_prefers_postprocessed_model(fresh_config):
    """iCaRL's herding poststep renames the chained model; a restart must
    pick the aux-carrying postprocessed file over the plain best model."""
    from clsurvey_tpu import methods as methods_lib
    from clsurvey_tpu.data import registry as data_lib
    from clsurvey_tpu.models import registry as models_lib
    from clsurvey_tpu.utils.config import load_config

    args = RunArgs(method_name="ICARL", starting_task_count=2, **COMMON)
    cfg = load_config()
    manager = Manager(
        args=args, dataset=data_lib.parse(COMMON["ds_name"]),
        method=methods_lib.parse("ICARL"),
        model_spec=models_lib.parse_model_name(
            cfg.models_root_path, COMMON["model_name"], (32, 32)),
        gridsearch_name="testgrid", exp_name="exp")
    tdir = manager.task_training_dir(1)
    os.makedirs(tdir, exist_ok=True)
    plain = os.path.join(tdir, paths_lib.BEST_MODEL_FILENAME)
    post = os.path.join(tdir, paths_lib.BEST_MODEL_POSTPROCESSED_FILENAME)
    io.save({"which": "plain"}, plain)
    assert get_init_model_path(args, manager) == plain
    io.save({"which": "post"}, post)
    assert get_init_model_path(args, manager) == post
