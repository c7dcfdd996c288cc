"""Within-framework draw-noise control for the head-to-head study.

The h2h eval-matrix deltas (docs/ref_head_to_head.md) mix two effects:
framework behavior and weight-draw noise (torch vs JAX RNG draws cannot
be aligned). This control isolates the second: run *ours alone* twice on
the same data with two seeds and measure how far the eval matrix moves.
If the within-framework spread matches the cross-framework deltas, the
h2h differences are draw noise, not behavior.

Run after both seed roots exist:
    python scripts/h2h/seed_control.py
Writes docs/h2h_seed_control.json (picked up by scripts/h2h/diff.py).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from scripts.h2h.diff import read_side  # noqa: E402

SEED_A, SEED_B = 7, 8
DS = "synthetic_3t_4c_32px_80n"
METHODS = ("finetuning", "EWC")


def main():
    roots = {
        SEED_A: os.path.join(REPO, "clsurvey_runs", "h2h_ours", "results"),
        SEED_B: os.path.join(REPO, "clsurvey_runs", "h2h_ours_s8",
                             "results"),
    }
    deltas = []
    for method in METHODS:
        sides = {}
        for seed, root in roots.items():
            sides[seed] = read_side(
                os.path.join(root, "train"),
                os.path.join(root, "test", "results"), DS, method)
        tasks = sorted(set(sides[SEED_A]["eval"]) &
                       set(sides[SEED_B]["eval"]))
        if not tasks:
            raise SystemExit(f"no overlapping eval tasks for {method} — "
                             "did the seed-8 run finish?")
        for t in tasks:
            a = sides[SEED_A]["eval"][t]
            b = sides[SEED_B]["eval"][t]
            deltas += [abs(y - x) for x, y in zip(a, b)]

    out = {
        "seed_a": SEED_A,
        "seed_b": SEED_B,
        "mean_abs": sum(deltas) / len(deltas),
        "max_abs": max(deltas),
        "cells": len(deltas),
        "scope": f"{'+'.join(METHODS)} on {DS}",
    }
    path = os.path.join(REPO, "docs", "h2h_seed_control.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, out)


if __name__ == "__main__":
    main()
