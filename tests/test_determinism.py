"""End-to-end determinism: the same RunArgs twice -> bit-identical eval
matrices (the guarantee behind the reference's set_random,
ref:src/utilities/utils.py:52-58, and our per-grid-iteration reseed,
framework/lr_grid.py)."""

import os

import numpy as np

from clsurvey_tpu.framework.common import RunArgs
from clsurvey_tpu.framework.main import main as run_main
from clsurvey_tpu.utils import config as config_lib
from clsurvey_tpu.utils import io
from clsurvey_tpu.utils import paths as paths_lib


def _run(root):
    os.environ["CLSURVEY_ROOT"] = str(root)
    config_lib.set_config(None)
    config_lib.set_config(config_lib.load_config(refresh=True))
    manager = run_main(RunArgs(
        model_name="tiny_CNN_cl_32_32",
        ds_name="synthetic_2t_4c_32px",
        method_name="finetuning",
        num_epochs=4,
        batch_size=32,
        lr_grid=(1e-2, 1e-3),
        gridsearch_name="determgrid",
        test=True,
    ))
    out_dir = paths_lib.get_test_results_path(
        "synthetic_2t_4c_32px", "finetuning", "tiny_CNN_cl_32_32",
        "determgrid", manager.exp_name, create=False)
    return [io.load(os.path.join(
        out_dir, f"test_method_performancesfinetuning{i}.pth"))
        for i in range(2)]


def test_same_seed_bit_identical(tmp_path):
    old = os.environ.get("CLSURVEY_ROOT")
    try:
        a = _run(tmp_path / "run_a")
        b = _run(tmp_path / "run_b")
    finally:
        if old is not None:
            os.environ["CLSURVEY_ROOT"] = old
        config_lib.set_config(None)
    for res_a, res_b in zip(a, b):
        sa = res_a["finetuning"]["seq_res"]
        sb = res_b["finetuning"]["seq_res"]
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
        assert np.asarray(sa).size > 0
