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


def _root(name):
    return os.path.join(REPO, "clsurvey_runs", name, "results")


# per-dataset seed roots: the separable set (r4 control) + the hd150
# hard-mode pair (VERDICT r4 Weak #3: the hd150 h2h means had no
# within-framework noise envelope measured in the same regime)
DATASETS = {
    DS: {7: _root("h2h_ours"), 8: _root("h2h_ours_s8"),
         9: _root("h2h_ours_s9"), 10: _root("h2h_ours_s10")},
    DS + "_hd150": {7: _root("h2h_ours_hd150"),
                    8: _root("h2h_ours_hd150_s8")},
}


def load_cells(root, ds):
    """{(method, task): [accs]} eval cells for one seed root."""
    cells = {}
    for method in METHODS:
        side = read_side(os.path.join(root, "train"),
                         os.path.join(root, "test", "results"), ds, method)
        for t, accs in side["eval"].items():
            cells[(method, t)] = accs
    return cells


def _section(ds, roots):
    """Pair statistics for one dataset, or None if <2 roots on disk."""
    sides = {}
    for seed, root in roots.items():
        if not os.path.isdir(root):
            continue
        cells = load_cells(root, ds)
        if cells:
            sides[seed] = cells
    if len(sides) < 2:
        return None

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
    return {
        "seeds": sorted(sides),
        "scope": f"{'+'.join(METHODS)} on {ds}",
        "pairs": pairs,
        "pooled_mean_abs": sum(abs_means) / len(abs_means),
        "max_abs": max(p["max_abs"] for p in pairs),
        "max_abs_mean_signed": max(abs(m) for m in signed_means),
        # kept for readers of the old schema
        "mean_abs": sum(abs_means) / len(abs_means),
        "cells": sum(p["cells"] for p in pairs),
    }


def main():
    path = os.path.join(REPO, "docs", "h2h_seed_control.json")
    # merge-not-truncate: sections whose runtime roots are gone (they die
    # with the VM) are carried from the committed file
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    by_ds = out.setdefault("by_ds", {})
    if DS not in by_ds and out.get("pairs"):
        # migrate a pre-r5 (flat-schema) file: its top-level stats ARE
        # the separable-set section
        by_ds[DS] = {k: out[k] for k in
                     ("seeds", "scope", "pairs", "pooled_mean_abs",
                      "max_abs", "max_abs_mean_signed", "mean_abs",
                      "cells") if k in out}
    computed = []
    for ds, roots in DATASETS.items():
        sec = _section(ds, roots)
        if sec is not None:
            by_ds[ds] = sec
            computed.append(ds)
    if not computed and not by_ds:
        raise SystemExit("need >= 2 completed seed roots for some dataset")
    # legacy top-level fields mirror the separable section
    legacy = by_ds.get(DS)
    if legacy:
        out.update(legacy)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, "computed:", computed or "(carried only)")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
