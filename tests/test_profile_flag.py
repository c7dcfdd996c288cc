"""--profile captures a jax.profiler trace of the first task's training
(the TPU-native equivalent of the reference's CUDA telemetry; see
framework/main.py profile handling)."""

import glob
import os

from clsurvey_tpu.framework.common import RunArgs
from clsurvey_tpu.framework.main import main as run_main


def test_profile_writes_trace(fresh_config):
    run_main(RunArgs(
        model_name="tiny_CNN_cl_32_32",
        ds_name="synthetic_2t_4c_32px",
        method_name="finetuning",
        num_epochs=2,
        batch_size=32,
        lr_grid=(1e-2,),
        gridsearch_name="profilegrid",
        max_task_count=1,
        profile=True,
    ))
    trace_dir = os.path.join(fresh_config.tr_results_root_path, "profile",
                             "synthetic_2t_4c_32px_finetuning")
    assert os.path.isdir(trace_dir)
    # the profiler writes plugins/profile/<ts>/*.xplane.pb (+ .trace.json)
    artifacts = glob.glob(os.path.join(trace_dir, "**", "*.*"),
                          recursive=True)
    assert artifacts, f"no trace artifacts under {trace_dir}"
