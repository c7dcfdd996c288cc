"""RecogSeq-scale demo: 8 unequal-class 224px tasks through the framework.

The reference's RecogSeq protocol (ref:src/main_recogseq.sh:16-29,
src/data/dataset.py:397-476) chains 8 recognition datasets with wildly
unequal class counts (flowers 102, scenes 67, birds 200, cars 196,
aircraft 100, actions 40, letters 62, SVHN 10) at 224x224 on AlexNet.
The real datasets cannot be downloaded here (no egress), so this demo
drives the *scale shape* end-to-end on synthetic data: same task count,
same per-task class counts, 224px, AlexNet, 100 imgs/class.

What this proves at real-task scale:
- the unequal-width stacked head bank (largest head 200 classes, smallest
  10) through training, eval, and the (task x model) matrix;
- automatic per-task mode selection: birds (3.0 GB) and cars (2.9 GB)
  exceed the 2 GB device-data budget and stream through chunked epochs,
  the other six tasks ride the resident fast path — within one sequence;
- the AlexNet-224 compute path task-chained 8 times.

Deviations from protocol, recorded in docs/DEVIATIONS.md: scratch
AlexNet (the torchvision-pretrained npz needs a download), reduced
epoch/grid budget (demo default 20 epochs, 2-lr grid vs 100 epochs,
5-lr grid).

Run (TPU): python scripts/demo_recogseq_scale.py [--epochs 20]
Writes docs/recogseq_scale.json + a summary to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CLASS_COUNTS = "102-67-200-196-100-40-62-10"
TASK_NAMES = ("flowers", "scenes", "birds", "cars", "aircraft",
              "actions", "letters", "svhn")
GRID = "recogseq_scale"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--n", type=int, default=100, help="train imgs/class")
    ap.add_argument("--batch_size", type=int, default=200)
    ap.add_argument("--lr_grid", default="5e-3,1e-3")
    ap.add_argument("--methods", default="finetuning,SI")
    ap.add_argument("--shp", action="append", default=[],
                    help="per-method static-hyperparam override, e.g. "
                         "ICARL=1024 (rehearsal memory size at scale)")
    ap.add_argument("--max_attempts", type=int, default=3)
    ap.add_argument("--out", default="docs/recogseq_scale.json")
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args(argv)

    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    # 224px task generation costs minutes of single-core numpy and the
    # bounded in-memory cache (CLSURVEY_SYNTH_MEM_BUDGET_MB) evicts big
    # tasks — persist them to npz so revisits (resume, eval matrix)
    # reload instead of regenerating (~18 GB for the full sequence).
    os.environ.setdefault(
        "CLSURVEY_SYNTH_CACHE",
        os.path.join(os.environ.get("CLSURVEY_ROOT", os.path.join(
            os.getcwd(), "clsurvey_runs")), "synth_cache"))

    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main
    from clsurvey_tpu.utils import io, paths as paths_lib

    ds_name = f"synthetic_8t_{CLASS_COUNTS}c_224px_{a.n}n"
    lr_grid = tuple(float(x) for x in a.lr_grid.split(","))
    common = dict(model_name="alexnet", ds_name=ds_name,
                  num_epochs=a.epochs, batch_size=a.batch_size,
                  lr_grid=lr_grid, gridsearch_name=GRID,
                  max_attempts_per_task=a.max_attempts)

    methods = [m for m in a.methods.split(",") if m]
    t0 = time.time()
    statuses: dict = {}
    # merge into any prior (partial) artifact: a cap-cut run must leave
    # whatever completed on disk, and a resume must not erase it
    if os.path.isfile(a.out):
        try:
            with open(a.out) as f:
                statuses.update(json.load(f).get("methods", {}))
        except Exception:
            pass

    def _write_artifact():
        result = {
            "ds": ds_name,
            "class_counts": [int(x) for x in CLASS_COUNTS.split("-")],
            "epochs": a.epochs, "lr_grid": list(lr_grid),
            "streamed_tasks": [t for t, c in zip(
                TASK_NAMES, CLASS_COUNTS.split("-"))
                if int(c) * a.n * 224 * 224 * 3 > 2048 * 2 ** 20],
            "methods": statuses,
            "total_secs": round(time.time() - t0),
        }
        os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
        with open(a.out, "w") as f:
            json.dump(result, f, indent=1)
        return result
    if any(m not in ("finetuning", "joint") for m in methods):
        print("== first-task base model (SI dump) ==", flush=True)
        run_main(RunArgs(method_name="SI",
                         runmode="first_task_basemodel_dump", **common))
    for name in methods:
        print(f"\n== {name} ==", flush=True)
        t1 = time.time()
        try:
            shp = dict(s.split("=", 1) for s in a.shp)
            manager = run_main(RunArgs(
                method_name=name, test=True,
                static_hyperparams=shp.get(name), **common))
            # collect the per-ref-task final-model accuracy row
            out_dir = paths_lib.get_test_results_path(
                ds_name, name, "alexnet", GRID, manager.exp_name,
                create=False)
            accs = {}
            for i, tname in enumerate(TASK_NAMES):
                path = os.path.join(
                    out_dir, f"test_method_performances{name}{i}.pth")
                if os.path.isfile(path):
                    seq = io.load(path)[name]["seq_res"][i]
                    accs[tname] = {"first": seq[0], "final": seq[-1]}
            statuses[name] = {"ok": True, "secs": round(time.time() - t1),
                              "per_task": accs}
        except Exception as e:
            traceback.print_exc()
            statuses[name] = {"ok": False, "error": str(e),
                              "secs": round(time.time() - t1)}
        _write_artifact()

    print(json.dumps(_write_artifact(), indent=1))


if __name__ == "__main__":
    main()
