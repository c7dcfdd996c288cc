"""Full-framework integration tests: task loop + LR grid + eval matrix."""

import os

import numpy as np
import pytest

from clsurvey_tpu.framework.common import RunArgs
from clsurvey_tpu.framework.main import main as run_main
from clsurvey_tpu.utils import io


@pytest.fixture()
def ft_args():
    return RunArgs(
        model_name="tiny_CNN_cl_32_32",
        ds_name="synthetic_2t_4c_32px",
        method_name="finetuning",
        num_epochs=8,
        batch_size=32,
        lr_grid=(1e-2, 1e-3),
        finetune_iterations=1,
        gridsearch_name="testgrid",
        test=True,
    )


@pytest.mark.smoke
def test_finetune_full_pipeline(fresh_config, ft_args):
    """Train FT over 2 synthetic tasks through the LR grid, then evaluate the
    full accuracy matrix and check the result-dict artifact format
    (ref:src/framework/eval.py:176-185)."""
    manager = run_main(ft_args)
    # models were trained per task
    for t in (1, 2):
        task_dir = manager.task_dir(t)
        assert os.path.isdir(task_dir), task_dir
    # task-2 model reachable via symlinked TASK_TRAINING
    assert io.exists(manager.previous_task_model_path)
    # Phase-1-only methods still report phase1 wall-clock per task
    times = io.load(os.path.join(manager.task_dir(2),
                                 "phase_timing.pth.tar"))
    assert times["phase1"] > 0

    # eval artifacts written with the reference dict shape
    from clsurvey_tpu.utils import paths as paths_lib

    out_dir = paths_lib.get_test_results_path(
        "synthetic_2t_4c_32px", "finetuning", "tiny_CNN_cl_32_32",
        "testgrid", manager.exp_name, create=False)
    # 0-based filenames like the reference's get_perf_output_filename
    # (ref:src/utilities/utils.py:220-228)
    res1 = io.load(os.path.join(
        out_dir, "test_method_performancesfinetuning0.pth"))
    assert "finetuning" in res1
    inner = res1["finetuning"]
    # reference keys must all be present; seq_per_class is our additive
    # observability extra (the reference loader indexes keys, never
    # iterates them, main_postprocessing.py:342-360)
    assert {"seq_res", "seq_forgetting", "seq_head_acc"} <= set(inner)
    # reference shape: one-key dicts {dataset_index: [...]}
    # (ref:src/framework/eval.py:204-214)
    assert set(inner["seq_res"]) == {0}
    assert len(inner["seq_res"][0]) == 2  # ref task 1 eval'd on models 1,2
    # reference shape: forgetting omits the self-comparison entry
    assert len(inner["seq_forgetting"][0]) == 1
    assert inner["seq_head_acc"] == []
    # first-task model should classify task 1 well (percentages)
    assert inner["seq_res"][0][0] > 60.0
    res2 = io.load(os.path.join(
        out_dir, "test_method_performancesfinetuning1.pth"))
    assert len(res2["finetuning"]["seq_res"][1]) == 1


def test_lr_grid_resume(fresh_config, ft_args):
    """Interrupt-and-resume: grid checkpoint skips processed lrs."""
    ft_args.test = False
    ft_args.max_task_count = 1
    run_main(ft_args)
    # rerunning must not retrain (grid checkpoint short-circuits)
    import time

    start = time.time()
    run_main(ft_args)
    assert time.time() - start < 30.0


def test_joint_baseline(fresh_config):
    args = RunArgs(
        model_name="tiny_CNN_cl_32_32",
        ds_name="synthetic_2t_4c_32px",
        method_name="joint",
        num_epochs=8,
        batch_size=32,
        lr_grid=(1e-2,),
        gridsearch_name="testgrid",
        test=True,
    )
    manager = run_main(args)
    assert manager.args.max_task_count == 1  # train_args_overwrite
    from clsurvey_tpu.utils import paths as paths_lib

    out_dir = paths_lib.get_test_results_path(
        "synthetic_2t_4c_32px", "joint", "tiny_CNN_cl_32_32",
        "testgrid", manager.exp_name, create=False)
    # Joint writes ONE full-batch artifact (ref:src/framework/eval.py:
    # 116-141, utils.py:225-226): flat seq_res, one acc per task
    res = io.load(os.path.join(
        out_dir, "test_method_performancesJOINT_FULL_BATCH.pth"))
    assert len(res["joint"]["seq_res"]) == 2
    assert res["joint"]["seq_res"][0] > 50.0


def test_eval_split_and_range_control(fresh_config):
    """--test_set / --test_starting_task_count / --test_max_task_count
    (ref:src/framework/main.py:71-74, eval.py:121,156, utils.py:178-179:
    non-test subsets land in <exp>_<subset> result dirs)."""
    args = RunArgs(
        model_name="tiny_CNN_cl_32_32", ds_name="synthetic_2t_4c_32px",
        method_name="finetuning", num_epochs=4, batch_size=32,
        lr_grid=(1e-2,), gridsearch_name="testgrid", test=True,
        test_set="val", test_max_task_count=1)
    manager = run_main(args)
    from clsurvey_tpu.utils import paths as paths_lib

    out_dir = paths_lib.get_test_results_path(
        "synthetic_2t_4c_32px", "finetuning", "tiny_CNN_cl_32_32",
        "testgrid", manager.exp_name, create=False, subset="val")
    assert out_dir.endswith("_val")
    # only ref task 1 evaluated (test_max_task_count=1)
    assert os.path.isfile(os.path.join(
        out_dir, "test_method_performancesfinetuning0.pth"))
    assert not os.path.isfile(os.path.join(
        out_dir, "test_method_performancesfinetuning1.pth"))
    res = io.load(os.path.join(
        out_dir, "test_method_performancesfinetuning0.pth"))
    assert len(res["finetuning"]["seq_res"][0]) == 2  # models 1 and 2


def test_cleanup_exp_and_test_overwrite_mode(fresh_config, ft_args):
    """--cleanup_exp wipes the experiment tree before training (refused
    while evaluating, ref:src/framework/main.py:142-147); eval artifacts
    are only rewritten under --test_overwrite_mode
    (ref:src/framework/eval.py:161-164)."""
    from clsurvey_tpu.utils import paths as paths_lib

    manager = run_main(ft_args)
    out_dir = paths_lib.get_test_results_path(
        "synthetic_2t_4c_32px", "finetuning", "tiny_CNN_cl_32_32",
        "testgrid", manager.exp_name, create=False)
    art = os.path.join(out_dir, "test_method_performancesfinetuning0.pth")
    mtime0 = os.path.getmtime(art)

    # rerun with --test: training skips via resume, eval must NOT rewrite
    run_main(ft_args)
    assert os.path.getmtime(art) == mtime0

    # overwrite mode rewrites the artifacts
    ft_args.test_overwrite_mode = True
    run_main(ft_args)
    assert os.path.getmtime(art) > mtime0
    ft_args.test_overwrite_mode = False

    # cleanup while evaluating is refused
    ft_args.cleanup_exp = True
    with pytest.raises(AssertionError):
        run_main(ft_args)

    # cleanup without --test wipes the tree and retrains from scratch
    sentinel = os.path.join(manager.task_dir(1), "SENTINEL")
    open(sentinel, "w").close()
    ft_args.test = False
    run_main(ft_args)
    assert not os.path.exists(sentinel)  # tree was removed and rebuilt
    assert io.exists(manager.best_model_path(1, create=False))


def test_hyperparam_decay_alternation():
    """Multi-hyperparam decay follows the reference's documented sequence
    exactly (ref:src/framework/framework_train.py:168-216 docstring):
    (5,2) -> (2.5,2) -> (5,1) -> (2.5,1) -> (1.25,1) -> (2.5,0.5)."""
    from collections import OrderedDict
    from types import SimpleNamespace

    from clsurvey_tpu.framework.hyperparam import HyperparameterFramework
    from clsurvey_tpu.methods import parse as parse_method

    method = parse_method("HAT")  # two decayed hyperparams (smax, c)
    method.hyperparams = OrderedDict([("lambda", 5.0), ("alpha", 2.0)])
    hf = HyperparameterFramework(method)
    args = SimpleNamespace(decaying_factor=0.5)
    seen = []
    for _ in range(5):
        hf.hyperparamDecay(args, None)
        seen.append(tuple(hf.hyperparams.values()))
    assert seen == [(2.5, 2.0), (5.0, 1.0), (2.5, 1.0), (1.25, 1.0),
                    (2.5, 0.5)], seen

    # single hyperparam: plain multiplicative decay
    method = parse_method("SI")
    method.hyperparams = OrderedDict([("lambda", 400.0)])
    hf = HyperparameterFramework(method)
    hf.hyperparamDecay(args, None)
    hf.hyperparamDecay(args, None)
    assert hf.hyperparams["lambda"] == 100.0

    # PathNet's decay_operator increments N instead of multiplying
    # (ref:src/methods/method.py:565-593)
    method = parse_method("pathnet")
    method.hyperparams = OrderedDict([("N", 3)])
    hf = HyperparameterFramework(method)
    hf.hyperparamDecay(args, None)
    assert hf.hyperparams["N"] == 4


def test_runmode_overwrites():
    """debug collapses the protocol; timing_mode fixes the measurement
    protocol (ref:src/framework/main.py:269-300)."""
    from clsurvey_tpu.framework.common import RunArgs

    a = RunArgs(model_name="tiny_CNN_cl_32_32",
                ds_name="synthetic_2t_4c_32px", method_name="finetuning",
                runmode="timing_mode", lr_grid=(1e-2, 1e-3),
                boot_lr_grid=(1e-1, 1e-2), num_epochs=70)
    a.apply_runmode()
    assert a.max_task_count == 4
    assert a.lr_grid == (5e-3,) and a.boot_lr_grid == (5e-3,)
    assert a.batch_size == 200 and a.num_epochs == 10
    assert a.finetune_iterations == 1

    b = RunArgs(model_name="tiny_CNN_cl_32_32",
                ds_name="synthetic_2t_4c_32px", method_name="finetuning",
                debug=True, lr_grid=(1e-2, 1e-3), boot_lr_grid=(1e-1, 1e-2),
                num_epochs=70)
    b.apply_runmode()
    assert b.lr_grid == (1e-2,) and b.boot_lr_grid == (1e-1,)
    assert b.num_epochs == 2 and b.finetune_iterations == 1


def test_no_augment_flag_threads_to_engine():
    """--no_augment (parity runs: the reference's framework path trains
    un-flipped, ref:src/framework/main.py:163,197) must reach the engine
    context through build_engine's manager.args gate."""
    from types import SimpleNamespace

    from clsurvey_tpu.framework.main import build_argparser
    from clsurvey_tpu.methods.base import UpdateRule
    from clsurvey_tpu.methods.common import build_engine
    from clsurvey_tpu.models.registry import parse_model_name

    ns = build_argparser().parse_args(
        ["tiny_CNN_cl_32_32", "--no_augment"])
    assert ns.augment is False
    assert build_argparser().parse_args(["tiny_CNN_cl_32_32"]).augment

    from clsurvey_tpu.data.registry import parse as parse_ds

    seq = parse_ds("synthetic_2t_4c_32px")
    spec = parse_model_name("/tmp/test_models", "tiny_CNN_cl_32_32",
                            seq.input_size)
    for flag in (True, False):
        manager = SimpleNamespace(
            dataset=seq, model_spec=spec, max_tasks=2,
            args=SimpleNamespace(augment=flag, weight_decay=0.0))
        engine = build_engine(manager, UpdateRule(), task_counter=1)
        assert engine.ctx.augment is flag
