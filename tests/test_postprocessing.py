"""Postprocessing + plot pipeline tests."""

import os

import numpy as np

from clsurvey_tpu.utils import io
from clsurvey_tpu.utilities.postprocessing import (
    ExperimentDataEntry, analyze_experiments, collect,
    collect_gridsearch_exp_entries)


def _write_results(root, method="EWC", tasks=3):
    exp_dir = os.path.join(root, "results", "tiny", method,
                           "small_VGG9_cl_128_128", "grid", "lambda=400")
    os.makedirs(exp_dir, exist_ok=True)
    for t in range(1, tasks + 1):
        n_models = tasks - t + 1
        seq = [80.0 - 5 * i for i in range(n_models)]
        io.save({method: {
            "seq_res": seq,
            "seq_forgetting": [seq[0] - a for a in seq[1:]],
            "seq_head_acc": [],
        }}, os.path.join(exp_dir,
                         f"test_method_performances{method}{t}.pth"))
    return exp_dir


def test_collect_and_metrics(tmp_path):
    _write_results(str(tmp_path))
    entries = collect_gridsearch_exp_entries(
        str(tmp_path), "tiny", "EWC", "small_VGG9_cl_128_128", "grid")
    assert len(entries) == 1
    e = entries[0]
    assert e.task_count == 3
    # final-model accs: task1 after 3 models = 70, task2 after 2 = 75,
    # task3 after 1 = 80
    np.testing.assert_allclose(e.final_model_accs, [70.0, 75.0, 80.0])
    np.testing.assert_allclose(e.avg_acc, 75.0)
    np.testing.assert_allclose(e.avg_forgetting, 5.0)


def test_analyze_writes_plot_and_table(tmp_path):
    _write_results(str(tmp_path))
    entries = collect_gridsearch_exp_entries(
        str(tmp_path), "tiny", "EWC", "small_VGG9_cl_128_128", "grid")
    img_base = str(tmp_path / "out" / "demo")
    table = analyze_experiments(entries, plot_seq_acc=True,
                                plot_seq_forgetting=True,
                                save_img_path=img_base)
    assert os.path.isfile(img_base + "_acc.png")
    assert os.path.isfile(img_base + "_forgetting.png")
    assert "EWC" in table and "75.00" in table


def test_demo_plot_config_runs_on_real_pipeline(fresh_config):
    """End-to-end: train FT on synthetic, then the demo plot config must
    consume the produced eval dicts unchanged (the reference-compat check,
    SURVEY §6)."""
    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main
    from clsurvey_tpu.utilities.plot_configs import demo

    run_main(RunArgs(
        model_name="tiny_CNN_cl_32_32", ds_name="synthetic_2t_4c_32px",
        method_name="finetuning", num_epochs=5, batch_size=32,
        lr_grid=(1e-2,), gridsearch_name="demo", test=True))
    entries = demo.main(ds_name="synthetic_2t_4c_32px",
                        model_name="tiny_CNN_cl_32_32",
                        gridsearch_name="demo",
                        save_img=str(fresh_config.test_results_root_path
                                     + "/demo_img"))
    assert len(entries) == 1
    assert entries[0].avg_acc > 50.0
