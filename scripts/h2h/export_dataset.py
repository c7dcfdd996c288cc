"""Export the shared head-to-head task sequences for the reference clone.

Arrays come from clsurvey_tpu's deterministic synthetic generator — the
SAME (ds_name, seed=7) our framework will regenerate bit-identically —
and are pickled as the per-task ``{train, val, test}`` dataset dicts the
reference's task loop consumes (ref:src/data/tinyimgnet_dataprep.py:
154-174, torch.save of the dict).

Run AFTER prepare_clone.py:
    python scripts/h2h/export_dataset.py [--dest clsurvey_runs/refclone]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

# the two sequences: trivially-separable (machinery diff, deterministic
# convergence) and Bayes-limited hard mode (behavior diff where accuracy
# is information-limited)
SEQUENCES = ("synthetic_3t_4c_32px_80n", "synthetic_3t_4c_32px_80n_hd150")


def export(dest: str):
    import torch

    from clsurvey_tpu.data.registry import parse

    clone_src = os.path.join(dest, "src")
    sys.path.insert(0, clone_src)
    from data.h2h import H2HDataset, H2HSplit  # noqa: E402

    out = {}
    for ds_name in SEQUENCES:
        seq = parse(ds_name)
        ds_dir = os.path.join(dest, "datasets", ds_name)
        os.makedirs(ds_dir, exist_ok=True)
        paths = []
        for t in range(1, seq.task_count + 1):
            td = seq.get_task_dataset(t)
            dsets = {
                "train": H2HSplit(td.train.images, td.train.labels,
                                  td.classes),
                "val": H2HSplit(td.val.images, td.val.labels, td.classes),
                "test": H2HSplit(td.test.images, td.test.labels,
                                 td.classes),
            }
            path = os.path.join(ds_dir, f"task_{t}.pth.tar")
            torch.save(dsets, path)
            paths.append(path)
            print(f"{ds_name} task {t}: train={len(dsets['train'])} "
                  f"val={len(dsets['val'])} test={len(dsets['test'])}")
        counts = [seq.classes_per_task[str(t)]
                  for t in range(1, seq.task_count + 1)]
        ds = H2HDataset(ds_name, seq.task_count, counts, seq.input_size,
                        paths)
        torch.save(ds, os.path.join(ds_dir, "dataset.pth.tar"))
        out[ds_name] = ds_dir
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest",
                    default=os.path.join(REPO, "clsurvey_runs", "refclone"))
    a = ap.parse_args(argv)
    export(a.dest)


if __name__ == "__main__":
    main()
