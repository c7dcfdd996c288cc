"""Drive ONE reference-clone framework run for the head-to-head.

Each invocation is one `framework/main.py` run of the CPU-patched clone
(one subprocess per run keeps module state clean, like the reference's
shell scripts, ref:src/main_tinyimagenet.sh:28-39):

    python scripts/h2h/run_ref.py --ds synthetic_3t_4c_32px_80n \
        --method_name SI --runmode first_task_basemodel_dump
    python scripts/h2h/run_ref.py --ds ... --method_name FT --test

Compatibility patches applied at runtime (never to /root/reference):
- torch.load(weights_only=False): the reference pickles whole nn.Modules
  (torch<=1.6 era); torch>=2.6 defaults to weights_only=True.
- the H2H dataset object is injected through main(dataset=...), the
  reference's own injection hook (ref:src/framework/main.py:79,91-92).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--clone",
                    default=os.path.join(REPO, "clsurvey_runs", "refclone"))
    ap.add_argument("--ds", required=True)
    ap.add_argument("--method_name", required=True)
    ap.add_argument("--runmode", default=None)
    ap.add_argument("--test", action="store_true")
    ap.add_argument("--model", default="small_VGG9_cl_128_128")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=20)
    ap.add_argument("--lr_grid", default="1e-2,5e-3,1e-3")
    ap.add_argument("--max_attempts", type=int, default=5)
    ap.add_argument("--gridsearch_name", default="h2h")
    ap.add_argument("--mem", type=int, default=None,
                    help="override mem_per_task for rehearsal methods "
                         "(the default 1024 exceeds the tiny h2h tasks)")
    ap.add_argument("--runs", default=None,
                    help="override the clone runs root (default "
                         "<clone>/runs) — e.g. a fresh root seeded by "
                         "share_init.py for shared-init legs")
    a = ap.parse_args(argv)

    clone_src = os.path.join(a.clone, "src")
    if a.runs:  # resolve BEFORE the chdir below, or relative paths nest
        a.runs = os.path.abspath(a.runs)
    sys.path.insert(0, os.path.join(a.clone, "shims"))
    sys.path.insert(0, clone_src)
    # the rehearsal trainer imports its GEM/iCaRL nets as a top-level
    # `model` package (ref:src/methods/rehearsal/main_rehearsal.py:214)
    # — resolvable only with methods/rehearsal on the path, as in the
    # reference's own run environment
    sys.path.insert(1, os.path.join(clone_src, "methods", "rehearsal"))
    os.chdir(clone_src)  # config.init paths resolve against src root

    # runs root: clone-local, survives reruns (resume machinery)
    cfg = os.path.join(clone_src, "config.init")
    runs = os.path.abspath(a.runs) if a.runs else os.path.join(
        a.clone, "runs")
    for sub in ("train", "test", "models", "datasets"):
        os.makedirs(os.path.join(runs, sub), exist_ok=True)
    with open(cfg, "w") as f:
        f.write("[DEFAULT]\n"
                f"tr_results_root_path = {runs}/train\n"
                f"test_results_root_path = {runs}/test\n"
                f"models_root_path = {runs}/models\n"
                f"ds_root_path = {runs}/datasets\n")

    import torch

    _orig_load = torch.load

    def _load(*args, **kwargs):
        kwargs.setdefault("weights_only", False)
        return _orig_load(*args, **kwargs)

    torch.load = _load

    ds_dir = os.path.join(a.clone, "datasets", a.ds)
    dataset = torch.load(os.path.join(ds_dir, "dataset.pth.tar"))

    argv_ref = [
        "main.py", a.model,
        "--method_name", a.method_name,
        "--ds_name", a.ds,
        "--num_epochs", str(a.epochs),
        "--batch_size", str(a.batch_size),
        "--lr_grid", a.lr_grid,
        "--max_attempts_per_task", str(a.max_attempts),
        "--gridsearch_name", a.gridsearch_name,
    ]
    if a.runmode:
        argv_ref += ["--runmode", a.runmode]
    if a.test:
        argv_ref += ["--test"]
    sys.argv = argv_ref

    import framework.main as ref_main
    import methods.method as ref_methods

    method = ref_methods.parse(a.method_name)
    if a.mem is not None and "mem_per_task" in getattr(
            method, "static_hyperparams", {}):
        method.static_hyperparams["mem_per_task"] = a.mem
    if a.method_name == "finetuning":
        # Head-to-head FINDING: the reference's Finetune defines no
        # `train` hook, so its framework path (framework_train.py:105)
        # crashes with AttributeError in the UNMODIFIED reference too —
        # the baseline is only drivable Phase-1-only. Route it through
        # lr_grid_single_task like the no_framework baselines
        # (ref:src/framework/main.py:165-166), which is also how our
        # framework treats it.
        method.no_framework = True

    ref_main.main(method=method, dataset=dataset)


if __name__ == "__main__":
    main()
