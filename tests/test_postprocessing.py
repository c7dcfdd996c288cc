"""Postprocessing + plot pipeline tests."""

import os

import numpy as np

from clsurvey_tpu.utils import io
from clsurvey_tpu.utilities.postprocessing import (
    ExperimentDataEntry, analyze_experiments, collect,
    collect_gridsearch_exp_entries)


def _write_results(root, method="EWC", tasks=3):
    """Flat-list series with 0-based filenames — the other artifact shape
    the reference's loader accepts (main_postprocessing.py:345-346)."""
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
                         f"test_method_performances{method}{t - 1}.pth"))
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


def _write_results_ref_convention(root, method="EWC", tasks=3,
                                  model="small_VGG9_cl_128_128",
                                  grid="grid", exp="lambda=400"):
    """Reference-exact artifacts: 0-based filenames + one-key dict series
    (ref:src/framework/eval.py:157-180, utils.py:220-228)."""
    exp_dir = os.path.join(root, "results", "tiny", method, model, grid,
                           exp)
    os.makedirs(exp_dir, exist_ok=True)
    for idx in range(tasks):
        n_models = tasks - idx
        seq = [80.0 - 5 * i for i in range(n_models)]
        io.save({method: {
            "seq_res": {idx: seq},
            "seq_forgetting": {idx: [seq[0] - a for a in seq[1:]]},
            "seq_head_acc": [],
        }}, os.path.join(exp_dir,
                         f"test_method_performances{method}{idx}.pth"))
    return exp_dir


def test_collect_reference_convention(tmp_path):
    """0-based filenames with dict-shaped series parse identically to the
    legacy layout."""
    _write_results_ref_convention(str(tmp_path))
    entries = collect_gridsearch_exp_entries(
        str(tmp_path), "tiny", "EWC", "small_VGG9_cl_128_128", "grid")
    assert len(entries) == 1
    e = entries[0]
    assert e.task_count == 3
    np.testing.assert_allclose(e.final_model_accs, [70.0, 75.0, 80.0])
    np.testing.assert_allclose(e.avg_acc, 75.0)
    np.testing.assert_allclose(e.avg_forgetting, 5.0)


def test_collect_joint_full_batch(tmp_path):
    """Joint's single full-batch artifact reformats into repeated-value
    curves (ref:main_postprocessing.py:276-307,363-370)."""
    exp_dir = os.path.join(str(tmp_path), "results", "tiny", "joint",
                           "small_VGG9_cl_128_128", "grid", "exp")
    os.makedirs(exp_dir)
    io.save({"joint": {"seq_res": [60.0, 55.0, 50.0]}},
            os.path.join(exp_dir,
                         "test_method_performancesJOINT_FULL_BATCH.pth"))
    entries = collect_gridsearch_exp_entries(
        str(tmp_path), "tiny", "joint", "small_VGG9_cl_128_128", "grid")
    assert len(entries) == 1
    e = entries[0]
    assert e.task_count == 3
    assert e.seq_acc[1] == [60.0, 60.0, 60.0]  # repeated, no forgetting
    assert e.seq_acc[3] == [50.0]
    np.testing.assert_allclose(e.avg_forgetting, 0.0)
    # Joint renders as a single final dot with a '*' label
    assert e.single_dot
    assert e.plot_label().startswith(e.label + "*")
    assert "(n/a)" in e.plot_label()


def test_family_styles():
    """Per-family linestyle/marker (ref:main_postprocessing.py:130-151)."""
    mk = lambda name: ExperimentDataEntry("tiny", name, "m", "g", "e", "/x")
    assert mk("finetuning").linestyle == ":"   # baseline family
    assert mk("packnet").marker == "x"         # mask family
    assert mk("LWF").marker == 11              # data family
    assert mk("mean_IMM").marker == "+"        # IMM special-case
    assert mk("EWC").marker == "1"             # model family
    assert mk("EWC").linestyle == "-"
    assert not mk("EWC").single_dot and mk("joint").single_dot


def test_analyze_versioned_and_forced_colors(tmp_path):
    """all_diff_color_force assigns distinct colors; rendered figures are
    never overwritten (ref:main_postprocessing.py:479-488)."""
    _write_results_ref_convention(str(tmp_path))
    _write_results_ref_convention(str(tmp_path), method="MAS")
    entries = []
    for m in ("EWC", "MAS"):
        entries += collect_gridsearch_exp_entries(
            str(tmp_path), "tiny", m, "small_VGG9_cl_128_128", "grid")
    img_base = str(tmp_path / "img" / "all")
    analyze_experiments(entries, save_img_path=img_base,
                        all_diff_color_force=True)
    assert len({e.color for e in entries}) == 2
    assert os.path.isfile(img_base + "_acc.png")
    analyze_experiments(entries, save_img_path=img_base)
    assert os.path.isfile(img_base + "_acc_v2.png")  # versioned, no clobber


def test_long_sequence_panel_subset(tmp_path):
    """>10-task sequences plot the reference's panel subset
    (ref:src/utilities/plot.py:38: tasks 1,5,10,15,20)."""
    _write_results_ref_convention(str(tmp_path), tasks=20)
    entries = collect_gridsearch_exp_entries(
        str(tmp_path), "tiny", "EWC", "small_VGG9_cl_128_128", "grid")
    from clsurvey_tpu.utilities.plot import plot_line_horizontal_sequence

    out = str(tmp_path / "long.png")
    plot_line_horizontal_sequence(entries, out)
    assert os.path.isfile(out)


def test_save_image_grid(tmp_path):
    """Exemplar visual check (ref:plot.py:223-246 imshow_tensor /
    gem.py:375-387)."""
    from clsurvey_tpu.utilities.plot import save_image_grid

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(10, 16, 16, 3), dtype=np.uint8)
    out = str(tmp_path / "mem.png")
    save_image_grid(imgs, out, labels=list(range(10)), title="buffer")
    assert os.path.isfile(out)


def test_entry_filters(tmp_path):
    """experiment_selection / exp_name_not_containing / label_func /
    explicit colors (ref:main_postprocessing.py:219-257)."""
    _write_results_ref_convention(str(tmp_path), exp="lambda=400")
    _write_results_ref_convention(str(tmp_path), exp="lambda=800")
    kw = dict(ds_name="tiny", eval_name="EWC",
              model_name="small_VGG9_cl_128_128", gridsearch_name="grid")
    root = str(tmp_path)
    assert len(collect_gridsearch_exp_entries(root, **kw)) == 2
    sel = collect_gridsearch_exp_entries(
        root, experiment_selection="lambda=400", **kw)
    assert [e.exp_name for e in sel] == ["lambda=400"]
    excl = collect_gridsearch_exp_entries(
        root, exp_name_not_containing="800", **kw)
    assert [e.exp_name for e in excl] == ["lambda=400"]
    styled = collect_gridsearch_exp_entries(
        root, label_func=lambda n: f"EWC[{n}]", colors=["red", "blue"],
        **kw)
    assert styled[0].label == "EWC[lambda=400]"
    assert [e.color for e in styled] == ["red", "blue"]


def test_collect_restricted_range_and_partial_eval(tmp_path):
    """Artifacts from --test_starting_task_count 2 (no index-0 file) and
    partial evals (later files missing) must map each file to its true
    ref task and never truncate complete series."""
    exp_dir = os.path.join(str(tmp_path), "results", "tiny", "EWC",
                           "small_VGG9_cl_128_128", "grid", "lambda=400")
    os.makedirs(exp_dir)
    # 5-task sequence, eval started at ref task 2, stopped after task 3:
    # files 1.pth (4 models) and 2.pth (3 models) only
    io.save({"EWC": {"seq_res": {1: [70.0, 65.0, 60.0, 55.0]},
                     "seq_forgetting": {1: []}, "seq_head_acc": []}},
            os.path.join(exp_dir, "test_method_performancesEWC1.pth"))
    io.save({"EWC": {"seq_res": {2: [80.0, 75.0, 72.0]},
                     "seq_forgetting": {2: []}, "seq_head_acc": []}},
            os.path.join(exp_dir, "test_method_performancesEWC2.pth"))
    e = collect(ExperimentDataEntry(
        "tiny", "EWC", "small_VGG9_cl_128_128", "grid", "lambda=400",
        exp_dir))
    assert e.task_count == 5  # implied by task 2 having 4 models
    assert 1 not in e.seq_acc  # ref task 1 was not evaluated
    assert e.seq_acc[2] == [70.0, 65.0, 60.0, 55.0]  # full, untruncated
    assert e.seq_acc[3] == [80.0, 75.0, 72.0]
    np.testing.assert_allclose(e.seq_forgetting[2], [5.0, 10.0, 15.0])


def test_collect_between_head_acc_empty_is_filtered(tmp_path):
    """seq_head_acc is always written empty (the reference never populates
    it either) — a between_head_acc entry must not survive collection with
    crash-prone empty series."""
    _write_results(str(tmp_path))
    entries = collect_gridsearch_exp_entries(
        str(tmp_path), "tiny", "EWC", "small_VGG9_cl_128_128", "grid",
        between_head_acc=True)
    assert entries == []


def test_collect_legacy_1based_filenames(tmp_path):
    """Files named 1..T (an older run of this repo) whose dicts carry the
    0-based {dataset_index: [...]} key must land on the right ref tasks —
    the internal key is authoritative, not the filename."""
    method = "EWC"
    exp_dir = os.path.join(str(tmp_path), "results", "tiny", method,
                           "small_VGG9_cl_128_128", "grid", "lambda=400")
    os.makedirs(exp_dir, exist_ok=True)
    tasks = 3
    for t in range(1, tasks + 1):
        seq = [80.0 - 5 * i for i in range(tasks - t + 1)]
        io.save({method: {
            "seq_res": {t - 1: seq},  # 0-based internal key ...
            "seq_forgetting": {t - 1: [seq[0] - a for a in seq[1:]]},
            "seq_head_acc": [],
        }}, os.path.join(exp_dir,  # ... under a legacy 1-based filename
                         f"test_method_performances{method}{t}.pth"))
    entries = collect_gridsearch_exp_entries(
        str(tmp_path), "tiny", method, "small_VGG9_cl_128_128", "grid")
    assert len(entries) == 1
    e = entries[0]
    assert e.task_count == 3
    assert sorted(e.seq_acc) == [1, 2, 3]
    np.testing.assert_allclose(e.final_model_accs, [70.0, 75.0, 80.0])


def test_collect_mixed_legacy_and_canonical_files(tmp_path):
    """A dir holding BOTH a legacy 1-based file and a canonical 0-based
    file for the same ref task must read each task exactly once, from the
    canonically-named file."""
    method = "EWC"
    exp_dir = os.path.join(str(tmp_path), "results", "tiny", method,
                           "small_VGG9_cl_128_128", "grid", "lambda=400")
    os.makedirs(exp_dir, exist_ok=True)
    # canonical file for ref task 2 (0-based index 1)
    io.save({method: {"seq_res": {1: [75.0, 70.0]},
                      "seq_forgetting": {1: [5.0]}, "seq_head_acc": []}},
            os.path.join(exp_dir, f"test_method_performances{method}1.pth"))
    # legacy-named duplicate of the SAME ref task, stale values
    io.save({method: {"seq_res": {1: [99.0, 99.0]},
                      "seq_forgetting": {1: [0.0]}, "seq_head_acc": []}},
            os.path.join(exp_dir, f"test_method_performances{method}2.pth"))
    # canonical file for ref task 3
    io.save({method: {"seq_res": {2: [80.0]},
                      "seq_forgetting": {2: []}, "seq_head_acc": []}},
            os.path.join(exp_dir, f"test_method_performances{method}3.pth"))
    entries = collect_gridsearch_exp_entries(
        str(tmp_path), "tiny", method, "small_VGG9_cl_128_128", "grid")
    e = entries[0]
    assert sorted(e.seq_acc) == [2, 3]
    np.testing.assert_allclose(e.seq_acc[2], [75.0, 70.0])


def test_collect_joint_restricted_range_dict(tmp_path):
    """Restricted-range Joint artifacts keyed {dataset_index: [acc]} must
    anchor each accuracy at its true task, not re-anchor at task 1."""
    method = "JOINT_FULL_BATCH"
    exp_dir = os.path.join(str(tmp_path), "results", "tiny", method,
                           "small_VGG9_cl_128_128", "grid", "e=10")
    os.makedirs(exp_dir, exist_ok=True)
    io.save({method: {"seq_res": {2: [64.0], 3: [58.0]}}},
            os.path.join(exp_dir,
                         "test_method_performancesJOINT_FULL_BATCH.pth"))
    e = ExperimentDataEntry(
        dataset_name="tiny", eval_name=method,
        model_name="small_VGG9_cl_128_128", gridsearch_name="grid",
        exp_name="e=10", results_dir=exp_dir, label="Joint")
    collect(e)
    assert e.task_count == 4
    assert sorted(e.seq_acc) == [3, 4]
    np.testing.assert_allclose(e.seq_acc[3], [64.0, 64.0])
    np.testing.assert_allclose(e.seq_acc[4], [58.0])


def test_plot_legend_handles_follow_label_order(tmp_path):
    """An entry with no task-1 series still gets a legend label, and the
    single-dot legend styling follows label order, not entries order."""
    from clsurvey_tpu.utilities import plot as plot_lib

    late = ExperimentDataEntry(
        dataset_name="tiny", eval_name="EWC", model_name="m",
        gridsearch_name="g", exp_name="late", results_dir=".",
        label="late-entry")
    late.seq_acc = {2: [70.0, 65.0], 3: [60.0]}
    late.task_count = 3
    joint = ExperimentDataEntry(
        dataset_name="tiny", eval_name="JOINT_FULL_BATCH", model_name="m",
        gridsearch_name="g", exp_name="joint", results_dir=".",
        label="joint-entry")
    joint.seq_acc = {1: [80.0] * 3, 2: [80.0] * 2, 3: [80.0]}
    joint.task_count = 3
    joint.single_dot = True
    out = str(tmp_path / "legend.png")
    plot_lib.plot_line_horizontal_sequence([late, joint],
                                           save_img_path=out, metric="acc")
    assert os.path.isfile(out)


def test_collect_joint_one_key_wrap_and_empty_truncation(tmp_path):
    """{0: [full list]} (the reference's one-key wrap) spreads over all
    tasks; truncating a restricted artifact to nothing zeroes task_count
    so the entry is filtered out."""
    method = "JOINT_FULL_BATCH"
    exp_dir = os.path.join(str(tmp_path), "results", "tiny", method,
                           "small_VGG9_cl_128_128", "grid", "e=10")
    os.makedirs(exp_dir, exist_ok=True)
    art = os.path.join(exp_dir,
                       "test_method_performancesJOINT_FULL_BATCH.pth")
    io.save({method: {"seq_res": {0: [90.0, 85.0, 80.0]}}}, art)

    def entry():
        return ExperimentDataEntry(
            dataset_name="tiny", eval_name=method,
            model_name="small_VGG9_cl_128_128", gridsearch_name="grid",
            exp_name="e=10", results_dir=exp_dir, label="Joint")

    e = collect(entry())
    assert e.task_count == 3
    np.testing.assert_allclose(e.seq_acc[1], [90.0] * 3)
    np.testing.assert_allclose(e.seq_acc[3], [80.0])

    io.save({method: {"seq_res": {2: [64.0], 3: [58.0]}}}, art)
    e = collect(entry(), max_task_count=2)
    assert e.task_count == 0 and not e.seq_acc
