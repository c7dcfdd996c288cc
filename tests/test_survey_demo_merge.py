"""Row-store merge + render policy of scripts/run_survey_demo.py.

The flagship tables accumulate across rounds through a persistent
per-method row store; a partial refresh must never truncate the table
(VERDICT r3 Weak #1) NOR destroy the canonical figures/summary, which
can only be regenerated from run artifacts in the current results tree
(carried rows' curves are gone with the runtime state).
"""

import json
import os
from types import SimpleNamespace

from scripts.run_survey_demo import _merge_rows, _write_markdown


def _entry(name, acc, forg=1.0, tasks=2):
    # seq_acc shaped like the live collector: task t's series starts at
    # model t; avg of finals == acc by construction
    seq_acc = {t: [acc + forg, acc][:tasks - t + 1] if t == 1 else [acc]
               for t in range(1, tasks + 1)}
    return SimpleNamespace(eval_name=name, exp_name="default",
                           avg_acc=acc, avg_forgetting=forg,
                           single_dot=False, seq_acc=seq_acc,
                           task_count=tasks,
                           hyperparams={"lambda": [400.0] * tasks})


def _seed_store(out_base):
    rows = {
        "EWC": {"exp": "lambda=400", "avg_acc": 45.11,
                "avg_forgetting": 0.63, "commit": "aaaaaaa",
                "date": "2026-08-18"},
        "finetuning": {"exp": "default", "avg_acc": 46.83,
                       "avg_forgetting": 7.87, "commit": "aaaaaaa",
                       "date": "2026-08-18"},
    }
    with open(out_base + "_rows.json", "w") as f:
        json.dump(rows, f)


def test_partial_refresh_merges_not_truncates(tmp_path):
    out = str(tmp_path / "tbl")
    _seed_store(out)
    rows, fresh = _merge_rows([_entry("LWF", 40.0)], out)
    assert set(rows) == {"EWC", "finetuning", "LWF"}
    assert fresh == {"LWF"}
    # a second empty render keeps everything
    rows2, fresh2 = _merge_rows([], out)
    assert set(rows2) == set(rows) and fresh2 == set()


def test_fresh_rows_overwrite_their_own_slot(tmp_path):
    out = str(tmp_path / "tbl")
    _seed_store(out)
    rows, _ = _merge_rows([_entry("EWC", 50.0)], out)
    assert rows["EWC"]["avg_acc"] == 50.0
    assert rows["finetuning"]["avg_acc"] == 46.83


def test_markdown_marks_carried_rows_and_keeps_notes(tmp_path):
    out = str(tmp_path / "tbl")
    _seed_store(out)
    with open(out + "_notes.md", "w") as f:
        f.write("## curated note\nsurvives regeneration")
    rows, fresh = _merge_rows([_entry("LWF", 40.0)], out)
    _write_markdown(rows, fresh, out, ds_name="synthetic_x", epochs=70)
    md = open(out + ".md").read()
    assert "| LWF |" in md and "(carried)" in md
    # fresh row is NOT marked carried
    lwf_line = [l for l in md.splitlines() if l.startswith("| LWF")][0]
    assert "(carried)" not in lwf_line
    assert "curated note" in md
    # partial-refresh figures are pointed at when they exist
    open(out + "_latestrun_acc.png", "wb").close()
    _write_markdown(rows, fresh, out, ds_name="synthetic_x", epochs=70)
    assert "_latestrun_acc.png" in open(out + ".md").read()


def test_curves_persist_and_carried_rows_render(tmp_path):
    """_merge_rows persists per-task curves + hyperparams; after the
    results tree dies, _carried_entries reconstructs a renderable entry
    whose metrics match the stored row (the r5 fix for figures being
    hostage to runtime state)."""
    from scripts.run_survey_demo import _carried_entries

    out = str(tmp_path / "tbl")
    rows, _ = _merge_rows([_entry("EWC", 45.0, forg=2.0)], out)
    assert rows["EWC"]["curves"]  # trajectories stored
    assert rows["EWC"]["hyperparams"]["lambda"] == [400.0, 400.0]
    # fresh run gone: reconstruct from the store alone
    rows2 = json.load(open(out + "_rows.json"))
    carried = _carried_entries(rows2, fresh=set())
    assert len(carried) == 1
    e = carried[0]
    assert e.eval_name == "EWC" and e.task_count == 2
    assert abs(e.avg_acc - 45.0) < 1e-6
    assert abs(e.avg_forgetting - 1.0) < 1e-6  # task1 forgets 2, task2 0
    assert e.hyperparams["lambda"] == [400.0, 400.0]
    # rows without curves (pre-r5 store) are silently skipped
    rows2["old"] = {"exp": "x", "avg_acc": 1.0, "avg_forgetting": None,
                    "commit": "", "date": ""}
    assert len(_carried_entries(rows2, fresh=set())) == 1


def test_canonical_coverage_is_monotone(tmp_path, monkeypatch):
    """The canonical figures update only when a render's coverage (fresh
    + stored curves) is a superset of the current canonical coverage
    (sidecar); narrower renders land on *_latestrun."""
    import sys

    import scripts.run_survey_demo as rsd

    out = str(tmp_path / "tbl")
    saved = []
    from clsurvey_tpu.utilities.postprocessing import ExperimentDataEntry

    class _Post:
        @staticmethod
        def collect_gridsearch_exp_entries(*a, **k):
            return []

        @staticmethod
        def collect_hyperparams(*a, **k):
            return None

        @staticmethod
        def pad_hyperparams(*a, **k):
            return None

        @staticmethod
        def analyze_experiments(entries, save_img_path=None, **k):
            saved.append(save_img_path)
            return "SUMMARY"

        @staticmethod
        def print_hyperparam_table(entries):
            return "HP"

    _Post.ExperimentDataEntry = ExperimentDataEntry

    import clsurvey_tpu.utilities as u
    monkeypatch.setattr(u, "postprocessing", _Post, raising=False)
    monkeypatch.setitem(sys.modules,
                        "clsurvey_tpu.utilities.postprocessing", _Post)
    monkeypatch.setattr(
        rsd, "METHODS", [("EWC", None, None), ("LWF", None, None)])

    def fake_collect(root, ds, name, model, grid):
        return [e for e in fake_collect.pool if e.eval_name == name]

    fake_collect.pool = [_entry("EWC", 45.0), _entry("LWF", 40.0)]
    monkeypatch.setattr(_Post, "collect_gridsearch_exp_entries",
                        staticmethod(fake_collect))
    import clsurvey_tpu.methods as methods_lib
    monkeypatch.setattr(methods_lib, "parse",
                        lambda n: SimpleNamespace(name=n))

    # seed: a full render over {EWC, LWF} becomes canonical

    rsd.postprocess("synthetic_x", out, epochs=70)
    assert saved[-1] == out  # canonical render
    covers = json.load(open(out + "_canonical.json"))["covers"]
    assert covers == ["EWC", "LWF"]

    # a narrower FRESH set now still covers everything via stored curves
    fake_collect.pool = [_entry("EWC", 50.0)]
    rsd.postprocess("synthetic_x", out, epochs=70)
    assert saved[-1] == out  # carried LWF curves keep coverage full

    # wipe LWF's curves from the store -> coverage shrinks -> latestrun
    rows = json.load(open(out + "_rows.json"))
    rows["LWF"].pop("curves")
    json.dump(rows, open(out + "_rows.json", "w"))
    fake_collect.pool = [_entry("EWC", 51.0)]
    rsd.postprocess("synthetic_x", out, epochs=70)
    assert saved[-1] == out + "_latestrun"
    # canonical sidecar unchanged
    assert json.load(open(out + "_canonical.json"))["covers"] == [
        "EWC", "LWF"]


def test_hyperparam_table_excludes_no_framework_entries():
    """IMM (no_framework) collects zero hyperparams; it must be dropped
    from the hyperparam table, not padded into an all-zero row."""
    from scripts.run_survey_demo import _hp_entries

    framework = SimpleNamespace(eval_name="EWC",
                                hyperparams={"lambda": [400.0]})
    no_framework = SimpleNamespace(eval_name="mean_IMM", hyperparams={})
    kept = _hp_entries([framework, no_framework])
    assert kept == [framework]


def test_empty_tree_render_touches_no_figures(tmp_path, monkeypatch):
    """postprocess([]) must not unlink canonical figures nor rewrite the
    summary (the r3 truncation disease, in the side files)."""
    import scripts.run_survey_demo as rsd

    out = str(tmp_path / "tbl")
    _seed_store(out)
    for suffix in ("_acc.png", "_forgetting.png", "_summary.txt"):
        with open(out + suffix, "w") as f:
            f.write("committed-artifact")
    monkeypatch.setattr(
        rsd, "postprocess", rsd.postprocess)  # keep real function

    from clsurvey_tpu.utilities.postprocessing import ExperimentDataEntry

    class _Post:
        @staticmethod
        def collect_gridsearch_exp_entries(*a, **k):
            return []

        @staticmethod
        def collect_hyperparams(*a, **k):
            return None

        @staticmethod
        def pad_hyperparams(*a, **k):
            return None

        @staticmethod
        def analyze_experiments(*a, **k):
            raise AssertionError("must not render figures on empty tree")

    _Post.ExperimentDataEntry = ExperimentDataEntry

    import clsurvey_tpu.utilities as u
    monkeypatch.setattr(u, "postprocessing", _Post, raising=False)
    import sys
    monkeypatch.setitem(sys.modules, "clsurvey_tpu.utilities.postprocessing",
                        _Post)
    entries, summary = rsd.postprocess("synthetic_x", out, epochs=70)
    assert entries == []
    assert "row store" in summary
    for suffix in ("_acc.png", "_forgetting.png", "_summary.txt"):
        assert open(out + suffix).read() == "committed-artifact"
    md = open(out + ".md").read()
    assert "| EWC |" in md and "| finetuning |" in md
