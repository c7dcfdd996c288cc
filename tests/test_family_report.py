"""Ordinal-check logic of scripts/hd200_family_report.py.

The family report is the accuracy-evidence stand-in for the
egress-blocked TPAMI comparison (VERDICT r4 Missing #1) — its checks
must fire correctly on both conforming and violating tables.
"""

from scripts.hd200_family_report import build_report


def _row(acc, forg):
    return {"exp": "x", "avg_acc": acc, "avg_forgetting": forg}


FULL = {
    "joint": _row(59.0, None),
    "finetuning": _row(46.8, 7.9),
    "EWC": _row(45.1, 0.6), "SI": _row(44.2, 1.3),
    "MAS": _row(44.1, -0.6),
    "LWF": _row(46.8, -1.6), "EBLL": _row(45.5, -0.5),
    "mean_IMM": _row(43.8, -6.9), "mode_IMM": _row(44.2, -4.0),
    "GEM": _row(46.5, 0.2), "ICARL": _row(47.0, -2.0),
    "finetuning_rehearsal_partial_mem": _row(46.0, -1.0),
    "finetuning_rehearsal_full_mem": _row(46.2, -1.2),
    "packnet": _row(43.0, 0.0), "HAT": _row(42.0, 0.0),
    "pathnet": _row(40.0, 0.0),
}


def _checkmap(rows):
    _, checks = build_report(rows)
    return {fid: ok for fid, _, ok in checks}


def test_all_checks_fire_on_full_conforming_table():
    cm = _checkmap(FULL)
    assert set(cm) == {"F1", "F2", "F3", "F4", "F5", "F6", "F7"}
    assert all(cm.values())


def test_checks_catch_violations():
    bad = {k: dict(v) for k, v in FULL.items()}
    bad["joint"] = _row(40.0, None)        # below the field
    bad["EWC"] = _row(45.1, 9.9)           # importance forgets a lot,
    #                                        and worse than finetuning
    bad["packnet"] = _row(43.0, 3.0)       # mask forgets
    cm = _checkmap(bad)
    assert not cm["F1"]
    assert not cm["F2"]  # finetuning no longer the worst
    assert not cm["F4"]
    assert not cm["F6"]


def test_partial_table_skips_absent_family_checks():
    partial = {k: FULL[k] for k in ("joint", "finetuning", "EWC", "SI",
                                    "MAS", "LWF")}
    cm = _checkmap(partial)
    assert "F3" not in cm and "F6" not in cm and "F7" not in cm
    assert cm["F1"] and cm["F2"] and cm["F4"] and cm["F5"]
