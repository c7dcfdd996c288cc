"""Shared test helpers."""

import os

from clsurvey_tpu.utils import io


def load_seq_res(out_dir: str, eval_name: str, ref_task: int) -> list:
    """Read one ref task's accuracy sequence from the eval artifact
    (reference conventions: 0-based filename, one-key dict series)."""
    res = io.load(os.path.join(
        out_dir,
        f"test_method_performances{eval_name}{ref_task - 1}.pth"))
    series = res[eval_name]["seq_res"]
    return series[ref_task - 1] if isinstance(series, dict) else series


def load_seq_forgetting(out_dir: str, eval_name: str,
                        ref_task: int) -> list:
    res = io.load(os.path.join(
        out_dir,
        f"test_method_performances{eval_name}{ref_task - 1}.pth"))
    series = res[eval_name]["seq_forgetting"]
    return series[ref_task - 1] if isinstance(series, dict) else series
