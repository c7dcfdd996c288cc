"""Pinned-head shared-init comparison (VERDICT r4 #2).

Compares the reference clone against clsurvey_tpu with EVERY weight draw
shared: the backbone init is ours' exported draw (share_init.py), and
each task's replaced head is drawn bit-identically on both sides from a
private torch.Generator(base + task_counter) (clone: h2h_pinned_linear,
installed by prepare_clone.py; ours: CLSURVEY_HEAD_INIT=torch_pinned:<base>,
models/heads.py — golden bit-match in tests/test_head_init.py). Three
bases = three fully-shared-init seeds; batch-shuffle order is the ONLY
remaining unshared randomness.

Reads   clsurvey_runs/refclone/runs_pin<B>   (ref legs, run_ref.py)
        clsurvey_runs/h2h_ours_pin<B>        (ours legs, run_ours.py)
Writes  docs/h2h_pinned.json + docs/h2h_pinned.md

Run: python scripts/h2h/pin_diff.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from scripts.h2h.diff import Stats, read_side  # noqa: E402

DS = "synthetic_3t_4c_32px_80n"
BASES = (1000, 2000, 3000)
METHODS = ("finetuning", "EWC")


def main():
    per_base = {}
    pooled = {m: Stats() for m in METHODS}
    diag = {m: [] for m in METHODS}  # (base, task, ref, ours)
    for base in BASES:
        ref_root = os.path.join(REPO, "clsurvey_runs", "refclone",
                                f"runs_pin{base}")
        ours_root = os.path.join(REPO, "clsurvey_runs",
                                 f"h2h_ours_pin{base}", "results")
        if not (os.path.isdir(ref_root) and os.path.isdir(ours_root)):
            continue
        cells = {}
        for m in METHODS:
            ref = read_side(os.path.join(ref_root, "train"),
                            os.path.join(ref_root, "test"), DS, m)
            ours = read_side(os.path.join(ours_root, "train"),
                             os.path.join(ours_root, "test", "results"),
                             DS, m)
            if not ref["eval"] or not ours["eval"]:
                continue
            for t in sorted(set(ref["eval"]) & set(ours["eval"])):
                r_accs, o_accs = ref["eval"][t], ours["eval"][t]
                pooled[m].add_row(t, r_accs, o_accs)
                cells[f"{m}_t{t}"] = {"ref": r_accs, "ours": o_accs}
                if r_accs and o_accs:
                    diag[m].append((base, t, r_accs[0], o_accs[0]))
        if cells:
            per_base[base] = cells

    out = {"datasets": DS, "bases_present": sorted(per_base),
           "methods": {}}
    md = [
        "# Pinned-head shared-init study — bit-identical inits end-to-end",
        "",
        "Every weight draw is shared: backbone from ours' exported init "
        "(`share_init.py`), per-task heads drawn bit-identically on both "
        "sides from `torch.Generator(base + task_counter)` "
        "(`prepare_clone.py` pin patches / "
        "`CLSURVEY_HEAD_INIT=torch_pinned:<base>`; byte-equality "
        "golden-tested in `tests/test_head_init.py`). Three bases "
        f"({', '.join(map(str, BASES))}) = three fully-shared-init "
        "seeds; batch-shuffle order is the only unshared randomness. "
        "Protocol: the h2h standard (10 epochs, batch 20, lr grid "
        "{1e-2, 5e-3, 1e-3}, 5 attempts) on the separable sequence — "
        "the regime where the r4 shared-init EWC block showed its worst "
        "residual (mean Δ −45.8, docs/ref_head_to_head.md).", "",
    ]
    for m in METHODS:
        s = pooled[m].summary()
        if not s:
            continue
        d = diag[m]
        n_diag_match = sum(1 for _, _, r, o in d if abs(r - o) < 1e-9)
        diag_gap = max((abs(r - o) for _, _, r, o in d), default=None)
        out["methods"][m] = {
            "cells": s["cells"], "mean_signed": s["mean_signed"],
            "mean_abs": s["mean_abs"], "max_abs": s["max_abs"],
            "sign_test_p": s.get("sign_p"),
            "diag_cells": len(d), "diag_exact_matches": n_diag_match,
            "diag_max_abs_gap": diag_gap,
        }
        md += [f"## {m}", "",
               f"- pooled over {len(per_base)} bases, {s['cells']} "
               f"eval cells: mean signed Δ (ours−ref) = "
               f"**{s['mean_signed']:+.2f}**, mean |Δ| = "
               f"{s['mean_abs']:.2f}, max |Δ| = {s['max_abs']:.2f}",
               f"- just-trained diagonal: {len(d)} cells, max gap "
               f"{diag_gap if diag_gap is None else round(diag_gap, 2)}",
               ""]
        md += ["| base | task | ref diag | ours diag | Δ |",
               "|---|---|---|---|---|"]
        for b, t, r, o in d:
            md.append(f"| {b} | {t} | {r:.2f} | {o:.2f} | {o - r:+.2f} |")
        md.append("")
    out["per_base"] = per_base

    os.makedirs(os.path.join(REPO, "docs"), exist_ok=True)
    with open(os.path.join(REPO, "docs", "h2h_pinned.json"), "w") as f:
        json.dump(out, f, indent=1)
    with open(os.path.join(REPO, "docs", "h2h_pinned.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps(out.get("methods", {}), indent=1))
    print("bases:", sorted(per_base))


if __name__ == "__main__":
    main()
