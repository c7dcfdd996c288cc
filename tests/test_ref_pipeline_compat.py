"""BASELINE.json's literal compatibility promise: the artifacts we write
must load in the REFERENCE's own postprocessing pipeline unchanged.

The reference loads eval dicts and hyperparams checkpoints with
``torch.load`` (ref:src/utilities/main_postprocessing.py:288,330) and
consumes them via ``collect_eval_metrics`` (:342-360) /
``collect_hyperparams`` (:373-392). This test transcribes that loader logic
(torch.load + the same key accesses) and runs it over a real framework run's
outputs; plus our own postprocessing (summary + hyperparam tables) over the
same tree."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

COMMON = dict(
    model_name="tiny_CNN_cl_32_32",
    ds_name="synthetic_2t_4c_32px",
    num_epochs=4, batch_size=32, lr_grid=(1e-2,),
    gridsearch_name="testgrid", max_attempts_per_task=2,
)


@pytest.fixture()
def ewc_run(fresh_config):
    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main

    run_main(RunArgs(method_name="SI",
                     runmode="first_task_basemodel_dump", **COMMON))
    manager = run_main(RunArgs(method_name="EWC", test=True, **COMMON))
    return manager


def _ref_collect_eval_metrics(eval_results, dataset_index, taskcount):
    """Transcription of ref collect_eval_metrics
    (main_postprocessing.py:342-360)."""
    if isinstance(eval_results, list):
        eval_results = {"": eval_results}
    assert len(eval_results.keys()) == 1
    out = {}
    for result_key in eval_results:
        res = eval_results[result_key][: taskcount - dataset_index]
        out["seq"] = res
        out["final_acc"] = res[-1]
        if len(res) > 1:
            out["forgetting"] = [res[0] - r for r in res[1:]]
    return out


def test_reference_loader_reads_our_eval_dicts(ewc_run):
    from clsurvey_tpu.utils import paths as paths_lib

    manager = ewc_run
    out_dir = paths_lib.get_test_results_path(
        COMMON["ds_name"], "EWC", COMMON["model_name"], "testgrid",
        manager.exp_name, create=False)
    taskcount = 2
    avg_acc, avg_forgetting = 0.0, 0.0
    for dataset_index in range(taskcount):
        # the reference's exact filename scheme + torch.load
        # (ref:utils.py:228: 'test_method_performances' + name + str(idx))
        acc_filename = (f"test_method_performancesEWC{dataset_index}"
                        f".pth")
        path = os.path.join(out_dir, acc_filename)
        method_performances = torch.load(path, weights_only=False)
        assert "EWC" in method_performances
        eval_results = method_performances["EWC"]["seq_res"]
        m = _ref_collect_eval_metrics(eval_results, dataset_index, taskcount)
        assert all(0.0 <= a <= 100.0 for a in m["seq"])
        avg_acc += m["final_acc"]
        avg_forgetting += m.get("forgetting", [0.0])[-1] \
            if len(m["seq"]) > 1 else 0.0
        # seq_forgetting in the artifact matches the recomputed one
        # (stored in the reference's one-key dict form, eval.py:178-180)
        stored_f = method_performances["EWC"]["seq_forgetting"]
        if isinstance(stored_f, dict):
            stored_f = stored_f[dataset_index]
        np.testing.assert_allclose(stored_f, m.get("forgetting", []),
                                   rtol=1e-6)
    avg_acc /= taskcount
    assert avg_acc > 50.0, avg_acc  # the run actually learned


def test_reference_loader_reads_our_hyperparams(ewc_run):
    from clsurvey_tpu.utils import paths as paths_lib

    manager = ewc_run
    # ref: hyperparam_parent_path/task_N/TASK_TRAINING/hyperparams.pth.tar,
    # loaded with torch.load (main_postprocessing.py:322-330)
    hp_path = os.path.join(
        paths_lib.get_train_results_path(
            COMMON["ds_name"], "EWC", COMMON["model_name"], "testgrid",
            manager.exp_name, task_counter=2, create=False),
        "TASK_TRAINING", "hyperparams.pth.tar")
    hyperparams_dict = torch.load(hp_path, weights_only=False)
    # collect_hyperparams iterates top-level keys (:373-392)
    assert {"acc_threshold", "val_acc", "state"} <= set(hyperparams_dict)
    assert "lambda" in hyperparams_dict["state"]["hyperparams"]


def test_own_postprocessing_tables(ewc_run):
    from clsurvey_tpu.utilities import postprocessing as post
    from clsurvey_tpu.utils.config import load_config

    cfg = load_config()
    entries = post.collect_gridsearch_exp_entries(
        cfg.test_results_root_path, COMMON["ds_name"], "EWC",
        COMMON["model_name"], "testgrid")
    assert len(entries) == 1 and entries[0].task_count == 2
    table = post.print_exp_statistics(entries)
    assert "EWC" in table

    counts = post.collect_hyperparams(entries[0], "EWC")
    assert any(k == "lambda" for k in counts), counts
    post.pad_hyperparams(entries, counts)
    htable = post.print_hyperparam_table(entries)
    assert "lambda" in htable
