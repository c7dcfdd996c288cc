"""run_timing_mode collector: phase_timing artifacts -> markdown table.

The runmode itself (arg overwrites) is covered in test_framework; this
pins the script glue that the unattended TPU queue relies on — the
artifact glob, per-task rows, missing-phase dashes, and the status json
round-trip (ref timing protocol: src/framework/main.py:289-300)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))

import run_timing_mode  # noqa: E402

from clsurvey_tpu.utils import io  # noqa: E402


def _plant(cfg, ds, method, task, times):
    d = os.path.join(cfg.tr_results_root_path, ds, method,
                     run_timing_mode.MODEL, "gridsearch",
                     run_timing_mode.GRID, "lam=1", task)
    os.makedirs(d, exist_ok=True)
    io.save(times, os.path.join(d, "phase_timing.pth.tar"))


def test_collect_builds_table(fresh_config, tmp_path):
    ds = "synthetic_4t_5c_64px"
    _plant(fresh_config, ds, "SI", "task_2",
           {"phase1": 12.5, "presteps": 0.0,
            "convergence_iteration": 30.25, "postprocess": 1.0})
    _plant(fresh_config, ds, "SI", "task_3",
           {"phase1": 11.0, "convergence_iteration": 29.0,
            "postprocess": None})  # missing/None phases render as dashes
    out = str(tmp_path / "timing_probe")
    statuses = {"SI": {"ok": True, "secs": 123},
                "EWC": {"ok": False, "error": "boom", "secs": 4}}
    run_timing_mode.collect(ds, ["SI", "EWC"], statuses, out)

    md = open(out + ".md").read()
    lines = [ln for ln in md.splitlines() if ln.startswith("| ")]
    # header + SI task_2 + SI task_3 + EWC placeholder
    assert len(lines) == 4
    assert "| SI | task_2 | 12.5 | 0.0 | 30.2 | 1.0 | 123 |" in md
    # second SI row: no repeated method name / total, dash for None
    assert "|  | task_3 | 11.0 | — | 29.0 | — |  |" in md
    # EWC trained nothing -> placeholder row with its wall-clock
    assert "| EWC | — | | | | | 4 |" in md
    assert json.load(open(out + "_status.json")) == statuses


def test_main_collect_only_without_artifacts(fresh_config, tmp_path):
    out = str(tmp_path / "empty_probe")
    run_timing_mode.main(["--collect_only", "--methods", "SI",
                          "--out", out])
    assert os.path.exists(out + ".md")


def test_unknown_method_rejected(capsys):
    try:
        run_timing_mode.main(["--collect_only", "--methods", "nope",
                              "--out", "/tmp/x"])
    except SystemExit as e:
        assert e.code == 2
    else:
        raise AssertionError("argparse should reject unknown methods")
