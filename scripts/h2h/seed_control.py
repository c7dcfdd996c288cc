"""Within-framework draw-noise control for the head-to-head study.

The h2h eval-matrix deltas (docs/ref_head_to_head.md) mix two effects:
framework behavior and weight-draw noise (torch vs JAX RNG draws cannot
be aligned). This control isolates the second: run *ours alone* on the
same data under several seeds and measure how far the eval matrix moves
between seed pairs. Two statistics matter:

- mean |Δ| per pair — the per-cell noise magnitude;
- mean signed Δ per pair — whether one seed's run can *dominate*
  another by draw luck alone (the null distribution against which the
  cross-framework signed mean is judged).

Run after the seed roots exist (clsurvey_runs/h2h_ours{,_s8,_s9,_s10}):
    python scripts/h2h/seed_control.py
Writes docs/h2h_seed_control.json (picked up by scripts/h2h/diff.py).
"""

from __future__ import annotations

import itertools
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from scripts.h2h.diff import read_side  # noqa: E402

DS = "synthetic_3t_4c_32px_80n"
METHODS = ("finetuning", "EWC")
ROOTS = {
    7: os.path.join(REPO, "clsurvey_runs", "h2h_ours", "results"),
    8: os.path.join(REPO, "clsurvey_runs", "h2h_ours_s8", "results"),
    9: os.path.join(REPO, "clsurvey_runs", "h2h_ours_s9", "results"),
    10: os.path.join(REPO, "clsurvey_runs", "h2h_ours_s10", "results"),
}


def load_cells(root):
    """{(method, task): [accs]} eval cells for one seed root."""
    cells = {}
    for method in METHODS:
        side = read_side(os.path.join(root, "train"),
                         os.path.join(root, "test", "results"), DS, method)
        for t, accs in side["eval"].items():
            cells[(method, t)] = accs
    return cells


def main():
    sides = {}
    for seed, root in ROOTS.items():
        if not os.path.isdir(root):
            continue
        cells = load_cells(root)
        if cells:
            sides[seed] = cells
    if len(sides) < 2:
        raise SystemExit("need >= 2 completed seed roots")

    pairs = []
    for a, b in itertools.combinations(sorted(sides), 2):
        deltas = []
        for key in sorted(set(sides[a]) & set(sides[b])):
            deltas += [y - x for x, y in zip(sides[a][key], sides[b][key])]
        if not deltas:
            continue
        pairs.append({
            "seeds": [a, b],
            "cells": len(deltas),
            "mean_signed": sum(deltas) / len(deltas),
            "mean_abs": sum(abs(d) for d in deltas) / len(deltas),
            "max_abs": max(abs(d) for d in deltas),
        })

    abs_means = [p["mean_abs"] for p in pairs]
    signed_means = [p["mean_signed"] for p in pairs]
    out = {
        "seeds": sorted(sides),
        "scope": f"{'+'.join(METHODS)} on {DS}",
        "pairs": pairs,
        "pooled_mean_abs": sum(abs_means) / len(abs_means),
        "max_abs": max(p["max_abs"] for p in pairs),
        "max_abs_mean_signed": max(abs(m) for m in signed_means),
        # kept for readers of the old schema
        "mean_abs": sum(abs_means) / len(abs_means),
        "cells": sum(p["cells"] for p in pairs),
    }
    path = os.path.join(REPO, "docs", "h2h_seed_control.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
